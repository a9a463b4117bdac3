"""Many-object scene: spheres + triangle mesh behind a uniform grid.

BASELINE.json config 4: "10k spheres + triangle-mesh floor with
uniform-grid/BVH traversal (ray-triangle path)". The scene keeps the demo
tier's lighting/camera/skybox contract, so the shared integrator + lighting
run unchanged — only the trace function differs (registered with
ttrt.render.dispatch).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.config import constants
from ttrt.mesh.grid import UniformGrid, build_grid, traverse_grid
from ttrt.mesh.triangles import Triangles, floor_mesh, ray_triangle
from ttrt.render import dispatch
from ttrt.render.intersect import Hit, ray_sphere_t0
from ttrt.render.skybox import sample_skybox
from ttrt.scene import (
    HIT_NONE,
    HIT_SPHERE,
    HIT_TRIANGLE,
    Camera,
    DirectionalLights,
    Materials,
    PointLights,
    Skybox,
    Spheres,

)
from ttrt.vec import Vec3


class MeshScene(NamedTuple):
    """Root aggregate of the many-object tier."""

    spheres: Spheres
    triangles: Triangles
    grid: UniformGrid
    directional_lights: DirectionalLights
    point_lights: PointLights
    camera: Camera
    skybox: Skybox

    def with_camera_frame(self, frame) -> "MeshScene":
        return self._replace(camera=self.camera._replace(frame=frame))

    def with_spheres(self, spheres: Spheres) -> "MeshScene":
        """Swap sphere positions (physics tier) — grid NOT rebuilt; callers
        animating spheres should rebuild or use a grid sized for the swept
        volume."""
        return self._replace(spheres=spheres)


def _gather_vec3(v: Vec3, idx) -> Vec3:
    return Vec3(jnp.take(v.x, idx), jnp.take(v.y, idx), jnp.take(v.z, idx))


def trace_ray_mesh(
    scene: MeshScene, o: Vec3, d: Vec3, *, sample_sky: bool = True,
    bilinear: bool = False,
) -> Hit:
    """Nearest-hit trace for the many-object tier returning the SAME Hit
    contract as the demo tier's trace_ray (miss fixups, EPSILON
    back-offset, guarded normalization — TerminalRayTracer.c:858-886), so
    the shared bounce loop and lighting are oblivious to the traversal.

    Traversal selection (static at trace time): on accelerator backends
    the DENSE blocked tester (ttrt.mesh.dense) — measured two orders of
    magnitude faster than the DDA grid walk on TPU, whose per-step gathers
    XLA lowers to ~8 ns/element — and the uniform grid on CPU, where
    gathers are cheap and the grid's O(visited cells) work wins.

    Attribute fetch happens ONCE per ray after traversal (normal + material
    gathers by winning object id) in the shared _finish_hit epilogue."""
    import jax as _jax

    if _jax.default_backend() == "cpu":
        gh = traverse_grid(scene.grid, scene.spheres, scene.triangles, o, d)
    else:
        from ttrt.mesh.dense import dense_nearest

        gh = dense_nearest(scene.spheres, scene.triangles, o, d)
    return _finish_hit(scene, o, d, gh, sample_sky, bilinear)


def trace_ray_mesh_brute(
    scene: MeshScene, o: Vec3, d: Vec3, *, sample_sky: bool = True,
    bilinear: bool = False,
) -> Hit:
    """Brute-force oracle: test EVERY sphere and triangle (lax.scan over
    chunks). Used by tests to validate the grid traversal and by tiny
    scenes where a grid is overhead."""
    dtype = o.x.dtype
    shape = o.x.shape
    best_t = jnp.full(shape, jnp.inf, dtype)
    best_obj = jnp.full(shape, -1, jnp.int32)
    n_spheres = scene.spheres.count

    CH = 64

    def scan_chunks(n, body, best):
        pad = (-n) % CH
        idx = jnp.arange(n + pad)
        valid = idx < n
        return jax.lax.scan(
            body,
            best,
            (idx.reshape(-1, CH), valid.reshape(-1, CH)),
        )[0]

    if n_spheres:
        def sph_body(best, xs):
            bt, bo = best
            ids, valid = xs
            for j in range(CH):
                i = ids[j]
                center = _gather_vec3(scene.spheres.center, i)
                t0, hit = ray_sphere_t0(o, d, center,
                                        jnp.take(scene.spheres.radius, i))
                take = hit & valid[j] & (t0 < bt)
                bt = jnp.where(take, t0, bt)
                bo = jnp.where(take, i.astype(jnp.int32), bo)
            return (bt, bo), None

        best_t, best_obj = scan_chunks(
            n_spheres, sph_body, (best_t, best_obj)
        )

    if scene.triangles.count:
        def tri_body(best, xs):
            bt, bo = best
            ids, valid = xs
            for j in range(CH):
                i = ids[j]
                v0 = _gather_vec3(scene.triangles.v0, i)
                e1 = _gather_vec3(scene.triangles.e1, i)
                e2 = _gather_vec3(scene.triangles.e2, i)
                tt, hit = ray_triangle(o, d, v0, e1, e2)
                take = hit & valid[j] & (tt < bt)
                bt = jnp.where(take, tt, bt)
                bo = jnp.where(take, (i + n_spheres).astype(jnp.int32), bo)
            return (bt, bo), None

        best_t, best_obj = scan_chunks(
            scene.triangles.count, tri_body, (best_t, best_obj)
        )

    from ttrt.mesh.grid import GridHit

    gh = GridHit(t=best_t, obj=best_obj)
    return _finish_hit(scene, o, d, gh, sample_sky, bilinear)


def _finish_hit(scene, o, d, gh, sample_sky, bilinear):
    """Shared hit-record construction from a (t, obj) traversal result."""
    # reuse trace_ray_mesh's fixup path by faking a traversal result
    n_spheres = scene.spheres.count
    hit_any = gh.obj >= 0
    is_tri = gh.obj >= n_spheres
    t = jnp.where(hit_any, gh.t, 0.0)
    point = Vec3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
    sidx = jnp.clip(gh.obj, 0, max(n_spheres - 1, 0))
    tidx = jnp.clip(gh.obj - n_spheres, 0, max(scene.triangles.count - 1, 0))
    s_center = _gather_vec3(scene.spheres.center, sidx)
    s_normal = point - s_center
    t_normal = _gather_vec3(scene.triangles.normal, tidx)
    normal_raw = t_normal.where(is_tri, s_normal)
    s_mat = scene.spheres.material.take(sidx)
    t_mat = scene.triangles.material.take(tidx)
    color = t_mat.color.where(is_tri, s_mat.color)
    refl = jnp.where(is_tri, t_mat.reflectivity, s_mat.reflectivity)
    spec = jnp.where(is_tri, t_mat.specularity, s_mat.specularity)
    to_origin = (o - point).normalize()
    eps = jnp.asarray(constants.EPSILON, o.x.dtype)
    point_off = Vec3(
        point.x + to_origin.x * eps,
        point.y + to_origin.y * eps,
        point.z + to_origin.z * eps,
    )
    point_out = point_off.where(hit_any, o)
    normal_out = normal_raw.where(hit_any, d).normalize()
    if sample_sky:
        sky = sample_skybox(scene.skybox, d, bilinear=bilinear)
        color = color.where(hit_any, sky)
    refl = jnp.where(hit_any, refl, 0.0)
    spec = jnp.where(hit_any, spec, 0.0)
    kind = jnp.where(
        hit_any, jnp.where(is_tri, HIT_TRIANGLE, HIT_SPHERE), HIT_NONE
    ).astype(jnp.int32)
    return Hit(
        kind=kind, point=point_out, normal=normal_out,
        material=Materials(color=color, reflectivity=refl, specularity=spec),
    )


dispatch.register_trace(MeshScene, trace_ray_mesh)


def many_sphere_scene(
    skybox: Skybox,
    n_spheres: int = 10_000,
    width_px: int = 480,
    height_px: int = 280,
    seed: int = 0,
    dtype=jnp.float32,
    floor_cells: int = 16,
    grid_resolution=None,
) -> MeshScene:
    """Config-4 scene: n random spheres in a slab above a triangle-mesh
    checker floor, same lights as the demo.

    Scene synthesis is pure NumPy + one transfer per leaf: the grid build
    needs the concrete geometry on host anyway, and EAGER device ops are
    pathologically slow on remote-compile backends (tens of seconds per
    op) — a 10k-sphere scene must not issue any."""
    rng = np.random.default_rng(seed)
    f32 = np.float32
    centers = np.stack(
        [
            rng.uniform(-15.0, 15.0, n_spheres),
            rng.uniform(-1.5, 8.0, n_spheres),
            rng.uniform(-15.0, 15.0, n_spheres),
        ],
        axis=-1,
    ).astype(f32)
    radii = rng.uniform(0.05, 0.25, n_spheres).astype(f32)
    colors = rng.uniform(0.1, 1.0, (n_spheres, 3)).astype(f32)
    refl = rng.uniform(0.0, 0.9, n_spheres).astype(f32)
    # slice in NumPy, transfer each leaf once (no eager device slicing)
    spheres = Spheres(
        center=Vec3(*(jnp.asarray(centers[:, i], dtype) for i in range(3))),
        radius=jnp.asarray(radii, dtype),
        material=Materials(
            color=Vec3(
                *(jnp.asarray(colors[:, i], dtype) for i in range(3))
            ),
            reflectivity=jnp.asarray(refl, dtype),
            specularity=jnp.asarray(
                np.full(n_spheres, 100.0, f32), dtype
            ),
        ),
    )
    tris = floor_mesh(y=-2.0, half_extent=20.0, cells=floor_cells,
                      dtype=dtype)
    grid = build_grid(spheres, tris, resolution=grid_resolution, dtype=dtype)

    directional = DirectionalLights(
        direction=Vec3.from_array(jnp.asarray([[-1.0, -1.0, -1.0]], dtype)),
        color=Vec3.from_array(jnp.asarray([[1.0, 1.0, 1.0]], dtype)),
    )
    point = PointLights(
        position=Vec3.from_array(jnp.asarray([[0.0, 4.0, 0.0]], dtype)),
        color=Vec3.from_array(jnp.asarray([[1.0, 1.0, 1.0]], dtype)),
        intensity=jnp.asarray([10.0], dtype),
    )
    return MeshScene(
        spheres=spheres,
        triangles=tris,
        grid=grid,
        directional_lights=directional,
        point_lights=point,
        camera=Camera.default(width_px, height_px, dtype),
        skybox=skybox,
    )
