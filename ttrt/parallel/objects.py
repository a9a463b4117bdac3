"""Object-parallel (geometry-sharded) scaling axis for scenes whose
cluster pack exceeds one chip's VMEM.

The row/sample axes (ttrt.parallel.sharding) scale RAYS and replicate
the geometry on every chip — the right layout while the packed tables
fit VMEM (~3M spheres/chip at the pack's ~5 KB/subcluster). Past that,
this module shards the SUBCLUSTER axis of the ClusterPack across an
'objects' mesh axis instead (the tensor-parallel analog for geometry,
vs the ray axes' data-parallel): every device holds 1/n of the Morton-
ordered subclusters, traces ALL rays against its slice with the
cluster-culled nearest-hit kernel (ttrt.kernels.mesh_pallas — the
launch-per-trace building block, NOT the monolithic fused kernel, whose
whole-pack VMEM residency is exactly the constraint being lifted), and
a cross-chip argmin-by-t combine picks the global winner:

    t_min = pmin(t_local)                      # nearest across shards
    obj   = pmin(obj_local where t == t_min)   # exact ties -> lowest id

Both collectives ride ICI. Tie resolution matches the sequential
reference scan (TerminalRayTracer.c:824-856: ascending ids, strict '<'
replace) because the pack carries ORIGINAL object ids (clusters.py row
maps), so the lowest global id wins an exact-t tie regardless of which
shard holds it — the sharded trace is therefore closer to the C scan's
tie semantics than any single-kernel visit order. Everything above the
trace (bounce loop, lighting, shadows, sky — the shared integrator) is
replicated and identical on every chip after each combine, as are the
raw SoA attribute tables (HBM-resident; the attribute gather is one
take per ray, only the VMEM-resident pack is the axis' constraint).

Shadow rays reuse the same combine through the integrator's any-hit
restructuring (a blocked test is t_min < distance — the combine is the
same pmin).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ttrt.config import RenderConfig
from ttrt.mesh.clusters import ClusterPack
from ttrt.mesh.grid import GridHit
from ttrt.mesh.scene import MeshScene, _finish_hit
from ttrt.render import dispatch
from ttrt.vec import Vec3

AXIS = "objects"  # the mesh axis name this module's collectives use


class ObjectShardedMeshScene(NamedTuple):
    """MeshScene twin whose registered trace combines local nearest hits
    across the 'objects' mesh axis (must run under shard_map over a mesh
    carrying that axis). Fields mirror MeshScene so the shared
    integrator, lighting, and _finish_hit epilogue are oblivious."""

    spheres: object
    triangles: object
    grid: Optional[object]
    directional_lights: object
    point_lights: object
    camera: object
    skybox: object
    clusters: Optional[ClusterPack] = None

    def with_camera_frame(self, frame) -> "ObjectShardedMeshScene":
        return self._replace(camera=self.camera._replace(frame=frame))


def pad_pack_subclusters(pack: ClusterPack, n: int) -> ClusterPack:
    """Pad BOTH subcluster axes (KB_s, KB_t) to multiples of ``n`` so an
    n-way 'objects' shard divides evenly. Padding subclusters are inert
    by the same construction pack_clusters uses: NaN AABBs fail every
    slab test (culled), and the narrow-table pad rows cannot hit (sphere
    ccr2 = +1e30 forces a negative discriminant; zero triangle edges
    give |det| under the epsilon; ids = -1 mark padding)."""

    def pad_kb(a, kb_axis, pad, fill):
        if pad == 0:
            return a
        shape = list(a.shape)
        shape[kb_axis] = pad
        return jnp.concatenate(
            [a, jnp.full(shape, fill, a.dtype)], axis=kb_axis
        )

    def pad_table(tab, pad, ccr2_row=None, id_row=None):
        if pad == 0:
            return tab
        block = np.zeros((tab.shape[0], pad, 8, tab.shape[3]), np.float32)
        if ccr2_row is not None:
            block[ccr2_row] = 1.0e30  # clusters._PAD_CCR2
        if id_row is not None:
            block[id_row] = -1.0
        return jnp.concatenate([tab, jnp.asarray(block)], axis=1)

    kb_s, kb_t = pack.kb_sph, pack.kb_tri
    pad_s = (-kb_s) % n if kb_s else 0
    pad_t = (-kb_t) % n if kb_t else 0
    if not pad_s and not pad_t:
        return pack
    nan = float("nan")
    return pack._replace(
        sph=pad_table(pack.sph, pad_s, ccr2_row=3, id_row=4),
        sph_lo=pad_kb(pack.sph_lo, 0, pad_s, nan),
        sph_hi=pad_kb(pack.sph_hi, 0, pad_s, nan),
        sph_valid=pad_kb(pack.sph_valid, 0, pad_s, 0),
        sph_lo_q=pad_kb(pack.sph_lo_q, 0, pad_s, nan),
        sph_hi_q=pad_kb(pack.sph_hi_q, 0, pad_s, nan),
        tri=pad_table(pack.tri, pad_t, id_row=9),
        tri_lo=pad_kb(pack.tri_lo, 0, pad_t, nan),
        tri_hi=pad_kb(pack.tri_hi, 0, pad_t, nan),
        tri_valid=pad_kb(pack.tri_valid, 0, pad_t, 0),
        tri_lo_q=pad_kb(pack.tri_lo_q, 0, pad_t, nan),
        tri_hi_q=pad_kb(pack.tri_hi_q, 0, pad_t, nan),
    )


def pack_specs() -> ClusterPack:
    """PartitionSpec pytree sharding every subcluster axis over AXIS."""
    kb1 = P(None, AXIS)  # (rows, KB, 8, 16) tables
    kb0 = P(AXIS)  # (KB, ...) AABBs / valid flags
    return ClusterPack(
        sph=kb1, sph_lo=kb0, sph_hi=kb0, sph_valid=kb0,
        tri=kb1, tri_lo=kb0, tri_hi=kb0, tri_valid=kb0,
        sph_lo_q=kb0, sph_hi_q=kb0, tri_lo_q=kb0, tri_hi_q=kb0,
    )


def scene_specs(scene: "ObjectShardedMeshScene"):
    """in_specs pytree for an ObjectShardedMeshScene: the cluster pack
    sharded over AXIS, every other leaf replicated."""
    reps = jax.tree.map(lambda _: P(), scene._replace(clusters=None))
    return reps._replace(clusters=pack_specs())


def combine_nearest(gh: GridHit, axis: str = AXIS) -> GridHit:
    """Cross-shard argmin-by-t: the global nearest (t, id) from each
    shard's local winner. Exact-t ties resolve to the LOWEST object id
    (the reference scan's semantics; see module docstring)."""
    tmin = jax.lax.pmin(gh.t, axis)
    int_max = jnp.int32(np.int32(2**31 - 1))
    cand = jnp.where((gh.t == tmin) & (gh.obj >= 0), gh.obj, int_max)
    obj = jax.lax.pmin(cand, axis)
    obj = jnp.where(jnp.isinf(tmin) | (obj == int_max), -1, obj)
    return GridHit(t=tmin, obj=obj)


def trace_ray_mesh_objects(
    scene: ObjectShardedMeshScene, o: Vec3, d: Vec3, *,
    sample_sky: bool = True, bilinear: bool = False,
):
    """Registered trace: local cluster-culled nearest on this device's
    pack shard, cross-chip combine, then the shared _finish_hit epilogue
    (attribute gather from the replicated raw SoA + the reference's miss
    fixups). Must execute inside shard_map over a mesh with AXIS."""
    from ttrt.kernels.mesh_pallas import cluster_nearest

    if jax.default_backend() == "cpu":
        # virtual-mesh validation: small interpret body (the production
        # body takes XLA:CPU many minutes — see trace_ray_mesh)
        gh = cluster_nearest(scene.clusters, o, d, interpret=True,
                             tile_rows=8, subs_per_page=2)
    else:
        gh = cluster_nearest(scene.clusters, o, d)
    return _finish_hit(scene, o, d, combine_nearest(gh), sample_sky,
                       bilinear)


dispatch.register_trace(ObjectShardedMeshScene, trace_ray_mesh_objects)


def shard_scene_objects(
    scene: MeshScene, mesh: Mesh
) -> ObjectShardedMeshScene:
    """MeshScene -> ObjectShardedMeshScene with the pack padded for an
    even AXIS split. The grid is dropped (CPU-only structure; the
    sharded trace is cluster-kernel-only)."""
    if scene.clusters is None:
        raise ValueError("object sharding needs a cluster pack")
    n = mesh.shape[AXIS]
    return ObjectShardedMeshScene(
        spheres=scene.spheres,
        triangles=scene.triangles,
        grid=None,
        directional_lights=scene.directional_lights,
        point_lights=scene.point_lights,
        camera=scene.camera,
        skybox=scene.skybox,
        clusters=pad_pack_subclusters(scene.clusters, n),
    )


def render_frame_sharded_objects(
    scene: MeshScene, cfg: RenderConfig, mesh: Mesh
) -> Tuple[Vec3, jnp.ndarray]:
    """Full-frame render with the geometry sharded over AXIS, composing
    with the ray axes when the mesh carries them: a 1D ('objects',) mesh
    replicates all rays on every chip (pure geometry parallelism), while
    a ('rows', 'objects') / ('rows', 'samples', 'objects') mesh ALSO
    splits the ray grid — the dp x tp composition: each chip traces its
    (row band x sample slice) against its subcluster slice, the per-
    trace pmin pair combines winners along 'objects', and the usual
    psum combines sample partials. Trace counts are objects-invariant
    after the combine (every chip sees the same decisions), so the total
    psums over the ray axes only."""
    from ttrt.render.integrator import generate_rays, trace_batch

    if AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no '{AXIS}' axis: {mesh.axis_names}")
    has_rows = "rows" in mesh.axis_names
    has_samp = "samples" in mesh.axis_names
    H, W, N = cfg.height, cfg.width, cfg.rays_per_pixel
    if has_rows and H % mesh.shape["rows"]:
        raise ValueError(
            f"height {H} not divisible by mesh rows {mesh.shape['rows']}"
        )
    if has_samp and N % mesh.shape["samples"]:
        raise ValueError(
            f"rays_per_pixel {N} not divisible by mesh samples "
            f"{mesh.shape['samples']}"
        )
    sharded = shard_scene_objects(scene, mesh)

    o, d = generate_rays(scene, cfg)

    def reshape(c):
        return c.reshape(H, W, N)

    o = Vec3(reshape(o.x), reshape(o.y), reshape(o.z))
    d = Vec3(reshape(d.x), reshape(d.y), reshape(d.z))
    ray_spec = P("rows" if has_rows else None, None,
                 "samples" if has_samp else None)
    fb_spec = jax.tree.map(
        lambda _: P("rows" if has_rows else None, None), Vec3(0, 0, 0)
    )

    @jax.shard_map(
        mesh=mesh,
        in_specs=(ray_spec, ray_spec, scene_specs(sharded)),
        out_specs=(fb_spec, P()),
        check_vma=False,
    )
    def body(o_shard, d_shard, scene_shard):
        h_loc, w, n_loc = o_shard.x.shape

        def flat(c):
            return c.reshape(-1)

        color, rays = trace_batch(
            scene_shard,
            Vec3(flat(o_shard.x), flat(o_shard.y), flat(o_shard.z)),
            Vec3(flat(d_shard.x), flat(d_shard.y), flat(d_shard.z)),
            cfg, count_rays=True,
        )

        def part(c):  # local partial sample sum
            return c.reshape(h_loc, w, n_loc).sum(axis=-1)

        fb = Vec3(part(color.x), part(color.y), part(color.z))
        if has_samp:
            fb = Vec3(jax.lax.psum(fb.x, "samples"),
                      jax.lax.psum(fb.y, "samples"),
                      jax.lax.psum(fb.z, "samples"))
            rays = jax.lax.psum(rays, "samples")
        if has_rows:
            rays = jax.lax.psum(rays, "rows")
        inv = 1.0 / N
        return Vec3(fb.x * inv, fb.y * inv, fb.z * inv), rays

    return body(o, d, sharded)
