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
from ttrt.mesh.clusters import ClusterPack as ClusterPackT
from ttrt.mesh.clusters import pack_clusters
from ttrt.mesh.grid import UniformGrid, build_grid, traverse_grid
from ttrt.mesh.triangles import (Triangles, floor_mesh, floor_mesh_np,
                                 ray_triangle)
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
    grid: Optional[UniformGrid]  # None = no acceleration (animated scenes)
    directional_lights: DirectionalLights
    point_lights: PointLights
    camera: Camera
    skybox: Skybox
    # TPU acceleration: Morton-clustered geometry for the Pallas
    # cluster-culled kernel (ttrt.kernels.mesh_pallas); None routes the
    # accelerator path to the plain dense tester.
    clusters: Optional["ClusterPackT"] = None

    def with_camera_frame(self, frame) -> "MeshScene":
        return self._replace(camera=self.camera._replace(frame=frame))

    def with_spheres(self, spheres: Spheres) -> "MeshScene":
        """Swap sphere positions (physics tier). Moving geometry
        INVALIDATES the static acceleration structures, so both the
        uniform grid and the cluster pack are dropped and tracing routes
        to the dense exhaustive tester on every backend — correct by
        construction for any motion. Callers that animate within a known
        volume can rebuild with ttrt.mesh.build_grid /
        ttrt.mesh.clusters.pack_clusters (host-side) and _replace(...) to
        get the accelerated paths back."""
        return self._replace(spheres=spheres, grid=None, clusters=None)


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
    gathers are cheap and the grid's O(visited cells) work wins. A scene
    whose geometry has moved (with_spheres) carries grid=None and routes
    to the dense tester on every backend: a stale grid can silently drop
    intersections, dense cannot.

    Attribute fetch happens ONCE per ray after traversal (normal + material
    gathers by winning object id) in the shared _finish_hit epilogue."""
    import jax as _jax

    on_cpu = _jax.default_backend() == "cpu"
    if on_cpu and scene.grid is not None and not _FORCE_CLUSTERS:
        gh = traverse_grid(scene.grid, scene.spheres, scene.triangles, o, d)
    elif scene.clusters is not None and (not on_cpu or _FORCE_CLUSTERS):
        from ttrt.kernels.mesh_pallas import cluster_nearest

        if on_cpu:
            # interpret mode with a small body: the production
            # 16-row x 8-subcluster body takes XLA:CPU many minutes to
            # compile on a 1-vCPU box; semantics are identical
            gh = cluster_nearest(scene.clusters, o, d, interpret=True,
                                 tile_rows=8, subs_per_page=2)
        else:
            gh = cluster_nearest(scene.clusters, o, d)
    else:
        from ttrt.mesh.dense import dense_nearest

        gh = dense_nearest(scene.spheres, scene.triangles, o, d)
    return _finish_hit(scene, o, d, gh, sample_sky, bilinear)


# test hook: route CPU traces through the cluster kernel (interpret mode)
_FORCE_CLUSTERS = False


def trace_ray_mesh_brute(
    scene: MeshScene, o: Vec3, d: Vec3, *, sample_sky: bool = True,
    bilinear: bool = False,
) -> Hit:
    """Brute-force oracle: test EVERY (object, ray) pair as one broadcast
    (N, R) block and take the columnwise nearest. Test-only (the grid and
    dense production paths are validated against it), so clarity and
    compile time beat memory frugality: an earlier chunked-scan version
    with 64 unrolled per-object gathers per step took XLA:CPU minutes to
    compile; this form compiles in seconds.

    Nearest-object tie-breaks match the sequential reference scan
    (trace_ray_mesh/dense: ascending ids, strict '<' replace): argmin
    returns the FIRST minimum, i.e. the lowest id, and a triangle
    replaces a sphere only on a strictly smaller t."""
    dtype = o.x.dtype
    shape = o.x.shape
    best_t = jnp.full(shape, jnp.inf, dtype)
    best_obj = jnp.full(shape, -1, jnp.int32)
    n_spheres = scene.spheres.count

    ob = Vec3(o.x[None, ...], o.y[None, ...], o.z[None, ...])
    db = Vec3(d.x[None, ...], d.y[None, ...], d.z[None, ...])

    def col(v):  # (N,) object column -> (N, 1...) broadcast vs rays
        return v.reshape((-1,) + (1,) * len(shape))

    def colv(v3: Vec3) -> Vec3:
        return Vec3(col(v3.x), col(v3.y), col(v3.z))

    if n_spheres:
        t0, hit = ray_sphere_t0(
            ob, db, colv(scene.spheres.center), col(scene.spheres.radius)
        )
        t0 = jnp.where(hit, t0, jnp.inf)
        best_t = jnp.min(t0, axis=0)
        best_obj = jnp.where(
            jnp.isfinite(best_t), jnp.argmin(t0, axis=0).astype(jnp.int32),
            -1,
        )

    if scene.triangles.count:
        tt, hit = ray_triangle(
            ob, db, colv(scene.triangles.v0), colv(scene.triangles.e1),
            colv(scene.triangles.e2),
        )
        tt = jnp.where(hit, tt, jnp.inf)
        tri_t = jnp.min(tt, axis=0)
        tri_obj = jnp.argmin(tt, axis=0).astype(jnp.int32) + n_spheres
        take = tri_t < best_t
        best_t = jnp.where(take, tri_t, best_t)
        best_obj = jnp.where(take, tri_obj, best_obj)

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
    spec = np.full(n_spheres, 100.0, f32)
    # slice in NumPy, transfer each leaf once (no eager device slicing)
    spheres = Spheres(
        center=Vec3(*(jnp.asarray(centers[:, i], dtype) for i in range(3))),
        radius=jnp.asarray(radii, dtype),
        material=Materials(
            color=Vec3(
                *(jnp.asarray(colors[:, i], dtype) for i in range(3))
            ),
            reflectivity=jnp.asarray(refl, dtype),
            specularity=jnp.asarray(spec, dtype),
        ),
    )
    tris_np = floor_mesh_np(y=-2.0, half_extent=20.0, cells=floor_cells)
    tris = Triangles.from_np(tris_np, dtype)
    # thread the HOST arrays into the grid/cluster builds: fetching the
    # device leaves back costs up to ~90 s/buffer on tunnel backends
    grid = build_grid(spheres, tris, resolution=grid_resolution,
                      dtype=dtype, np_spheres=(centers, radii),
                      np_tris=tris_np)

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
        clusters=pack_clusters(
            spheres, tris,
            np_spheres=(centers, radii, colors, refl, spec),
            np_tris=tris_np,
        ),
        directional_lights=directional,
        point_lights=point,
        camera=Camera.default(width_px, height_px, dtype),
        skybox=skybox,
    )
