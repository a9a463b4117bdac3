"""Scene model: struct-of-arrays pytrees for spheres, plane, lights, camera,
skybox.

Mirrors the reference's scene structs (TerminalRayTracer.c:60-208) but as
batched arrays: N spheres are ``(N,)`` component arrays, not N structs, so a
single vectorized intersection test covers the whole object list (and scales
from the demo's 6 spheres to the many-object tier without code changes).

All containers are NamedTuples (hence JAX pytrees): they flow through
jit/vmap/scan/shard_map, and object counts are static shape information so
XLA sees fully static programs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.frames import Frame
from ttrt.vec import Vec3, vec3

# Hit-kind tags (ObjectType enum, TerminalRayTracer.c:61-67).
HIT_NONE = 0
HIT_SPHERE = 1
HIT_GROUND = 2
HIT_TRIANGLE = 3  # extension: triangle-mesh tier (reference roadmap)


class Materials(NamedTuple):
    """Batch of materials (Material struct, TerminalRayTracer.c:113-119).

    ``specularity`` is carried for API parity: the reference sets it
    (TerminalRayTracer.c:1257-1273) but its only consumer is commented-out
    Blinn-Phong code (TerminalRayTracer.c:913-916). Our lighting exposes an
    optional specular term behind a config flag (off by default = parity).
    """

    color: Vec3
    reflectivity: jnp.ndarray
    specularity: jnp.ndarray

    @staticmethod
    def create(colors, reflectivity, specularity=100.0, dtype=jnp.float32):
        colors = jnp.asarray(colors, dtype)
        n = colors.shape[:-1]
        return Materials(
            color=Vec3.from_array(colors),
            reflectivity=jnp.broadcast_to(jnp.asarray(reflectivity, dtype), n),
            specularity=jnp.broadcast_to(jnp.asarray(specularity, dtype), n),
        )

    def take(self, idx) -> "Materials":
        return Materials(
            color=Vec3(
                jnp.take(self.color.x, idx),
                jnp.take(self.color.y, idx),
                jnp.take(self.color.z, idx),
            ),
            reflectivity=jnp.take(self.reflectivity, idx),
            specularity=jnp.take(self.specularity, idx),
        )


class Spheres(NamedTuple):
    """SoA sphere batch (Sphere struct, TerminalRayTracer.c:160-166)."""

    center: Vec3  # each component (N,)
    radius: jnp.ndarray  # (N,)
    material: Materials  # each leaf (N,)

    @property
    def count(self) -> int:
        return self.radius.shape[-1]

    @staticmethod
    def create(centers, radii, colors, reflectivity, specularity=100.0,
               dtype=jnp.float32) -> "Spheres":
        centers = jnp.asarray(centers, dtype)
        return Spheres(
            center=Vec3.from_array(centers),
            radius=jnp.broadcast_to(
                jnp.asarray(radii, dtype), centers.shape[:-1]
            ),
            material=Materials.create(colors, reflectivity, specularity, dtype),
        )


class Plane(NamedTuple):
    """Checkerboard ground plane (Plane struct, TerminalRayTracer.c:168-175)."""

    point: Vec3  # scalar components
    normal: Vec3
    even_material: Materials  # scalar leaves
    odd_material: Materials


class DirectionalLights(NamedTuple):
    """SoA directional lights (TerminalRayTracer.c:145-150)."""

    direction: Vec3  # (L,)
    color: Vec3

    @property
    def count(self) -> int:
        return self.direction.x.shape[-1]


class PointLights(NamedTuple):
    """SoA point lights with inverse-square falloff (TerminalRayTracer.c:152-158)."""

    position: Vec3  # (L,)
    color: Vec3
    intensity: jnp.ndarray

    @property
    def count(self) -> int:
        return self.intensity.shape[-1]


class Camera(NamedTuple):
    """Pinhole camera: pose frame + screen geometry
    (Camera struct, TerminalRayTracer.c:177-184; defaults
    TerminalRayTracer.c:298-305: screen 1 m away, world size
    5*(W/H) x 5 m)."""

    frame: Frame
    screen_distance: jnp.ndarray
    screen_width: jnp.ndarray
    screen_height: jnp.ndarray

    @staticmethod
    def default(width_px: int, height_px: int, dtype=jnp.float32) -> "Camera":
        return Camera(
            frame=Frame.identity(dtype),
            screen_distance=jnp.asarray(1.0, dtype),
            screen_width=jnp.asarray(5.0 * width_px / height_px, dtype),
            screen_height=jnp.asarray(5.0, dtype),
        )


@jax.tree_util.register_pytree_node_class
class Skybox:
    """Cubemap skybox (Skybox struct, TerminalRayTracer.c:129-135).

    TPU-first texel layout: the six square faces are ONE uint32 array of
    shape ``(6, dim, dim)`` with each texel packed as 0x00RRGGBB. A texel
    fetch is then a single 4-byte gather (instead of three) — the gather
    is the dominant cost of the whole renderer on TPU — and unpacking is
    three cheap VPU shift/ands. The float [0,1] value is texel/255
    computed in the ray batch's dtype, matching the reference's conversion
    at sample time (TerminalRayTracer.c:866).

    ``procedural`` is STATIC pytree metadata naming the generator that
    produced the texels (e.g. 'colors', 'uv_checker'), or None for image
    data. The Pallas render kernel uses it to evaluate known patterns
    in-kernel — bit-identical to the stored texels — skipping the texel
    gather entirely (the gather is otherwise the single most expensive op
    of the whole renderer: XLA lowers per-element gathers to ~8 ns each).

    Face order is +X,-X,+Y,-Y,+Z,-Z (TerminalRayTracer.c:132).
    """

    def __init__(self, packed: jnp.ndarray, procedural: Optional[str] = None):
        self.packed = packed  # (6, dim, dim) uint32, 0x00RRGGBB
        self.procedural = procedural

    def tree_flatten(self):
        return (self.packed,), self.procedural

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    def __eq__(self, other):
        return (
            isinstance(other, Skybox)
            and other.procedural == self.procedural
            and other.packed is self.packed
        )

    @property
    def dim(self) -> int:
        return self.packed.shape[-1]

    @staticmethod
    def from_uint8(faces_u8, procedural: Optional[str] = None) -> "Skybox":
        """(6, dim, dim, 3) uint8 -> packed device Skybox."""
        f = jnp.asarray(faces_u8, jnp.uint32)
        return Skybox(
            packed=(f[..., 0] << 16) | (f[..., 1] << 8) | f[..., 2],
            procedural=procedural,
        )

    def to_uint8(self) -> jnp.ndarray:
        """Unpack to (6, dim, dim, 3) uint8 (tests / image export)."""
        p = self.packed
        return jnp.stack(
            [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF], axis=-1
        ).astype(jnp.uint8)


class Scene(NamedTuple):
    """Root aggregate (Scene struct, TerminalRayTracer.c:195-208)."""

    spheres: Spheres
    ground: Plane
    directional_lights: DirectionalLights
    point_lights: PointLights
    camera: Camera
    skybox: Skybox

    def with_camera_frame(self, frame: Frame) -> "Scene":
        return self._replace(camera=self.camera._replace(frame=frame))


# ---------------------------------------------------------------------------
# Demo scene (TerminalRayTracer.c:1256-1306) — must reproduce exactly.
# ---------------------------------------------------------------------------

GROUND_EVEN_COLOR = (1.0, 1.0, 1.0)  # TerminalRayTracer.c:88
GROUND_ODD_COLOR = (1.0, 0.0, 0.0)  # TerminalRayTracer.c:89
SKY_COLOR = (0.5372549019607842924, 0.7686274509803922017, 0.9568627450980392579)
# ^ unused by the active reference render path (TerminalRayTracer.c:85), kept
#   for API-surface parity.


def demo_scene(
    skybox: Skybox,
    width_px: int = 480,
    height_px: int = 280,
    dtype=jnp.float32,
) -> Scene:
    """The hard-coded demo: 6 axis spheres, checker ground, one directional
    + one point light, orbiting camera (TerminalRayTracer.c:1256-1306)."""
    spheres = Spheres.create(
        centers=np.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [-1.0, 0.0, 0.0],
                [0.0, -1.0, 0.0],
                [0.0, 0.0, -1.0],
            ]
        ),
        radii=np.full((6,), 0.5),
        colors=np.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [0.0, 1.0, 1.0],
                [1.0, 0.0, 1.0],
                [1.0, 1.0, 0.0],
            ]
        ),
        reflectivity=np.array([1.0, 0.8, 0.8, 0.8, 0.8, 0.8]),
        specularity=100.0,
        dtype=dtype,
    )
    ground = Plane(
        point=vec3(0.0, -2.0, 0.0, dtype),
        normal=vec3(0.0, 1.0, 0.0, dtype),
        even_material=Materials.create(
            np.array(GROUND_EVEN_COLOR), 0.2, 100.0, dtype
        ),
        odd_material=Materials.create(
            np.array(GROUND_ODD_COLOR), 0.2, 100.0, dtype
        ),
    )
    directional = DirectionalLights(
        direction=Vec3.from_array(jnp.asarray([[-1.0, -1.0, -1.0]], dtype)),
        color=Vec3.from_array(jnp.asarray([[1.0, 1.0, 1.0]], dtype)),
    )
    point = PointLights(
        position=Vec3.from_array(jnp.asarray([[0.0, 0.0, 0.0]], dtype)),
        color=Vec3.from_array(jnp.asarray([[1.0, 1.0, 1.0]], dtype)),
        intensity=jnp.asarray([10.0], dtype),
    )
    return Scene(
        spheres=spheres,
        ground=ground,
        directional_lights=directional,
        point_lights=point,
        camera=Camera.default(width_px, height_px, dtype),
        skybox=skybox,
    )


def random_spheres(
    key, n: int, dtype=jnp.float32,
    center_range=(-1.0, 1.0), radius_range=(0.1, 0.5),
    reflectivity=0.5,
) -> Spheres:
    """Vectorized analog of ``init_random_sphere`` (TerminalRayTracer.c:239-249):
    n spheres with uniform random centers, radii, colors. Used by the
    many-object tier and benchmarks."""
    import jax

    kc, kr, kcol = jax.random.split(key, 3)
    centers = jax.random.uniform(
        kc, (n, 3), dtype, center_range[0], center_range[1]
    )
    radii = jax.random.uniform(kr, (n,), dtype, radius_range[0], radius_range[1])
    colors = jax.random.uniform(kcol, (n, 3), dtype)
    return Spheres(
        center=Vec3.from_array(centers),
        radius=radii,
        material=Materials.create(colors, reflectivity, 100.0, dtype),
    )
