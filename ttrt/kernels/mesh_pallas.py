"""Pallas TPU kernel for the many-object tier: cluster-culled nearest-hit.

The demo-tier kernel (render_pallas) keeps its 6-sphere scene in SMEM
scalars; 10k spheres need a different shape. This kernel cuts WORK instead
of streaming smarter:

  grid = (ray tiles, geometry SUBCLUSTERS of 128 objects); the whole
  packed table (~220 KB at 10k spheres) stays VMEM-RESIDENT for the
  entire launch (constant index map; the 4D (C, KB, 8, 16) layout keeps
  the subcluster axis ABOVE the tiled dims so in-kernel indexing by the
  grid position is legal — Mosaic rejects dynamic lane offsets), and the
  XLA broad phase (clusters.live_clusters) precomputes a
  (tile, ray row, subcluster) live matrix that rides in as a
  scalar-prefetch operand: each of a step's eight 128-ray rows skips its
  ~500-instruction pair-block body with its own pl.when (row granularity
  roughly halves the surviving work vs whole-tile culling on coherent
  camera rays). Typical scenes cull 70-90% of the pair work — the only
  way past the VPU roofline that a dense exhaustive test pins
  (ttrt/mesh/dense.py).

Pair-block shape: spheres ride SUBLANES, rays ride LANES. A subcluster is
16 (8, 1) component columns (static in-register slices of the loaded
block); each pairs against a (1, 128) ray row as a native (8, 128) vreg
with zero transposes or gathers. Per-ray best (t, id) accumulates in VMEM
scratch as 8 SUBLANE-CLASS PARTIALS per ray (no per-block lane
reductions — the fold to a single winner happens once per tile, 3 halving
steps, at the last grid step).

Reference lineage: ray_intersects_sphere (TerminalRayTracer.c:638-672)
restructured exactly as ttrt.mesh.dense documents (shared 1/(2a),
precomputed |C|^2 - r^2, sqrt-free predicates); the triangle path is
Moller-Trumbore with the reference's plane epsilons
(TerminalRayTracer.c:680,685) matching ttrt.mesh.triangles.ray_triangle.
The winning ids are ORIGINAL object indices (the pack stores them as an
f32 component row), so the shared _finish_hit epilogue and material
gathers are oblivious to the Morton reordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttrt.config import constants
from ttrt.mesh.clusters import (GROUPS, TILE_RAYS, ClusterPack,
                                live_clusters)
from ttrt.mesh.grid import GridHit
from ttrt.vec import Vec3

_F32_MAX = float(np.finfo(np.float32).max)


def _col(block_comp, c):
    """Static (8, 1) column slice of a loaded (8, GROUPS) block."""
    return jax.lax.slice(block_comp, (0, c), (8, c + 1))


def _bcast_col(v):  # (8, 1) -> (8, 128), ONE explicit broadcast op
    return jnp.broadcast_to(v, (8, 128))


def _bcast_row(v):  # (1, 128) -> (8, 128)
    return jnp.broadcast_to(v, (8, 128))


def _mesh_kernel(
    live_ref,  # scalar prefetch: (T, 8, KB) int32 (row-granular)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (1, 8, 128) ray tiles
    sph_ref,  # (5, KB_s, 8, 16) FULL resident sphere table (or None)
    tri_ref,  # (10, KB_t, 8, 16) FULL resident triangle table (or None)
    out_t_ref, out_id_ref,  # (1, 8, 128) per-tile winners
    bp_t, bp_id,  # VMEM scratch (64, 128): 8 ray rows x 8 sublane classes
    inv_s,  # VMEM scratch (32, 128): per-row od, oo, 4a, inv2a
    *,
    kb_sph: int,
    kb_tri: int,
    mode: str = "row",  # culling predicate granularity (see cluster_nearest)
):
    i = pl.program_id(0)
    k = pl.program_id(1)  # subcluster index

    def ray_row(r):
        # pre-broadcast the ray row to full (8, 128) ONCE — implicit
        # (1,128)x(8,128) broadcasts inside the pair math would otherwise
        # re-materialize per op
        ox = _bcast_row(ox_ref[0, r : r + 1, :])
        oy = _bcast_row(oy_ref[0, r : r + 1, :])
        oz = _bcast_row(oz_ref[0, r : r + 1, :])
        dx = _bcast_row(dx_ref[0, r : r + 1, :])
        dy = _bcast_row(dy_ref[0, r : r + 1, :])
        dz = _bcast_row(dz_ref[0, r : r + 1, :])
        return ox, oy, oz, dx, dy, dz

    @pl.when(k == 0)
    def _init():
        bp_t[...] = jnp.full((64, 128), _F32_MAX, jnp.float32)
        bp_id[...] = jnp.full((64, 128), -1.0, jnp.float32)
        # hoist the per-ray quadratic invariants ONCE per tile (saves
        # ~20 instructions + a divide per live (row, subcluster) step)
        for r in range(8):
            ox, oy, oz, dx, dy, dz = ray_row(r)
            a = dx * dx + dy * dy + dz * dz
            inv_s[r * 4 + 0 : r * 4 + 1, :] = (
                ox * dx + oy * dy + oz * dz
            )[0:1]
            inv_s[r * 4 + 1 : r * 4 + 2, :] = (
                ox * ox + oy * oy + oz * oz
            )[0:1]
            inv_s[r * 4 + 2 : r * 4 + 3, :] = (4.0 * a)[0:1]
            inv_s[r * 4 + 3 : r * 4 + 4, :] = (0.5 / a)[0:1]

    if mode == "noop":
        kb_sph = kb_tri = 0  # measurement mode: pure grid+fold cost

    def any_live():
        v = live_ref[i, 0, k]
        for rr in range(1, 8):
            v = v | live_ref[i, rr, k]
        return v != 0

    def sphere_row(r):
        ks = jnp.minimum(k, kb_sph - 1)
        cxp = sph_ref[0, ks]  # (8, 16) comps from resident VMEM
        cyp = sph_ref[1, ks]
        czp = sph_ref[2, ks]
        ccp = sph_ref[3, ks]
        idp = sph_ref[4, ks]
        ox, oy, oz, dx, dy, dz = ray_row(r)
        od = _bcast_row(inv_s[r * 4 + 0 : r * 4 + 1, :])
        oo = _bcast_row(inv_s[r * 4 + 1 : r * 4 + 2, :])
        four_a = _bcast_row(inv_s[r * 4 + 2 : r * 4 + 3, :])
        inv2a = _bcast_row(inv_s[r * 4 + 3 : r * 4 + 4, :])
        bt = bp_t[r * 8 : (r + 1) * 8, :]
        bid = bp_id[r * 8 : (r + 1) * 8, :]
        for g in range(GROUPS):
            cx = _bcast_col(_col(cxp, g))  # (8, 128)
            cy = _bcast_col(_col(cyp, g))
            cz = _bcast_col(_col(czp, g))
            ccr2 = _bcast_col(_col(ccp, g))
            sid = _bcast_col(_col(idp, g))
            cd = cx * dx + cy * dy + cz * dz  # (8, 128)
            co = cx * ox + cy * oy + cz * oz
            b = 2.0 * (od - cd)
            cc = oo - 2.0 * co + ccr2
            disc = b * b - four_a * cc
            hit = (disc >= 0.0) & (b < 0.0) & (cc > 0.0)
            t0 = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv2a
            take = hit & (t0 < bt)
            bt = jnp.where(take, t0, bt)
            bid = jnp.where(take, sid, bid)
        bp_t[r * 8 : (r + 1) * 8, :] = bt
        bp_id[r * 8 : (r + 1) * 8, :] = bid

    def tri_row(r):
        kt = jnp.maximum(k - kb_sph, 0)
        comps = [tri_ref[c, kt] for c in range(10)]  # (8, 16)
        ox, oy, oz, dx, dy, dz = ray_row(r)
        bt = bp_t[r * 8 : (r + 1) * 8, :]
        bid = bp_id[r * 8 : (r + 1) * 8, :]
        for g in range(GROUPS):
            (v0x, v0y, v0z, e1x, e1y, e1z,
             e2x, e2y, e2z, tid) = (
                _bcast_col(_col(c, g)) for c in comps
            )
            # Moller-Trumbore, plane epsilons of c:680,685
            px = dy * e2z - dz * e2y  # (8, 128)
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > constants.PLANE_DENOM_EPS
            inv = 1.0 / jnp.where(ok, det, 1.0)
            sx = ox - v0x
            sy = oy - v0y
            sz = oz - v0z
            u = (sx * px + sy * py + sz * pz) * inv
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            hit = (
                ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (tt > constants.PLANE_T_EPS)
            )
            take = hit & (tt < bt)
            bt = jnp.where(take, tt, bt)
            bid = jnp.where(take, tid, bid)
        bp_t[r * 8 : (r + 1) * 8, :] = bt
        bp_id[r * 8 : (r + 1) * 8, :] = bid

    if kb_sph and mode == "tile":
        @pl.when(any_live() & (k < kb_sph))
        def _sphere_all():
            for r in range(8):
                sphere_row(r)
    elif kb_sph:
        for r in range(8):
            @pl.when((live_ref[i, r, k] != 0) & (k < kb_sph))
            def _sphere_one(r=r):
                sphere_row(r)

    if kb_tri and mode == "tile":
        @pl.when(any_live() & (k >= kb_sph))
        def _tri_all():
            for r in range(8):
                tri_row(r)
    elif kb_tri:
        for r in range(8):
            @pl.when((live_ref[i, r, k] != 0) & (k >= kb_sph))
            def _tri_one(r=r):
                tri_row(r)

    @pl.when(k == kb_sph + kb_tri - 1)
    def _fold():
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        out_t = jnp.full((8, 128), _F32_MAX, jnp.float32)
        out_id = jnp.full((8, 128), -1.0, jnp.float32)
        for r in range(8):
            bt = bp_t[r * 8 : (r + 1) * 8, :]
            bid = bp_id[r * 8 : (r + 1) * 8, :]
            for h in (4, 2, 1):
                t_hi = bt[h : 2 * h, :]
                i_hi = bid[h : 2 * h, :]
                t_lo = bt[0:h, :]
                i_lo = bid[0:h, :]
                tk = t_hi < t_lo
                bt = jnp.where(tk, t_hi, t_lo)
                bid = jnp.where(tk, i_hi, i_lo)
            out_t = jnp.where(row_iota == r, bt, out_t)  # bt: (1,128) bcast
            out_id = jnp.where(row_iota == r, bid, out_id)
        out_t_ref[0] = out_t
        out_id_ref[0] = out_id


@functools.partial(
    jax.jit, static_argnames=("kb_sph", "kb_tri", "interpret", "mode")
)
def _cluster_nearest_padded(
    pack: ClusterPack,
    live: jnp.ndarray,  # (T, 8, KB) int32
    o6,  # 6 arrays (T, 8, 128) f32
    kb_sph: int,
    kb_tri: int,
    interpret: bool = False,
    mode: str = "row",
):
    T = o6[0].shape[0]
    ray_spec = pl.BlockSpec(
        (1, 8, 128), lambda i, k, live: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    geom_in = []
    geom_specs = []
    # geometry stays FULLY VMEM-RESIDENT (constant index map -> ONE fetch
    # for the whole launch; ~220 KB at the 10k tier). A per-step DMA of
    # the active subcluster was measured CATASTROPHIC when culling works:
    # a dead (skipped) step still paid its block fetch latency, ~21 us —
    # 5x the cost of a LIVE step's compute.
    if kb_sph:
        geom_in.append(pack.sph)
        geom_specs.append(pl.BlockSpec(
            pack.sph.shape, lambda i, k, live: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    if kb_tri:
        geom_in.append(pack.tri)
        geom_specs.append(pl.BlockSpec(
            pack.tri.shape, lambda i, k, live: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))

    def kernel(live_ref, *refs):
        rays = refs[:6]
        n = 6
        sph = refs[n] if kb_sph else None
        n += 1 if kb_sph else 0
        tri = refs[n] if kb_tri else None
        n += 1 if kb_tri else 0
        _mesh_kernel(live_ref, *rays, sph, tri, *refs[n:],
                     kb_sph=kb_sph, kb_tri=kb_tri, mode=mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, kb_sph + kb_tri),
        in_specs=[ray_spec] * 6 + geom_specs,
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, k, live: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, k, live: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((64, 128), jnp.float32),
            pltpu.VMEM((64, 128), jnp.float32),
            pltpu.VMEM((32, 128), jnp.float32),
        ],
    )
    out_t, out_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(live, *o6, *geom_in)
    return out_t, out_id


def cluster_nearest(
    pack: ClusterPack, o: Vec3, d: Vec3, *, interpret: bool = False,
    mode: str = "row",
) -> GridHit:
    """Nearest (t, original object id) over the packed clusters. Drop-in
    for ttrt.mesh.dense.dense_nearest on scenes carrying a ClusterPack.
    Rays may be any count/direction (zero-padded to 1024-ray tiles; a
    zero direction yields a == 0 -> b == 0 -> no hit, so padding cannot
    win). ``mode`` picks the culling predicate granularity: "row"
    (default, one pl.when per 128-ray row), "tile" (one per 1024-ray
    step), or "noop" (measurement: grid machinery only, outputs misses)."""
    R = o.x.shape[0]
    T = -(-R // TILE_RAYS)
    pad = T * TILE_RAYS - R

    def p(x):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
        return x

    flat = [p(o.x), p(o.y), p(o.z), p(d.x), p(d.y), p(d.z)]
    live = live_clusters(
        pack,
        Vec3(flat[0], flat[1], flat[2]),
        Vec3(flat[3], flat[4], flat[5]),
        T,
    )
    o6 = tuple(x.reshape(T, 8, 128) for x in flat)
    out_t, out_id = _cluster_nearest_padded(
        pack, live, o6, pack.kb_sph, pack.kb_tri, interpret, mode
    )
    t = out_t.reshape(-1)[:R]
    obj = out_id.reshape(-1)[:R].astype(jnp.int32)
    hit_ok = obj >= 0
    return GridHit(
        t=jnp.where(hit_ok, t, jnp.inf), obj=jnp.where(hit_ok, obj, -1)
    )
