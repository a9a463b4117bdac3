"""Pallas TPU kernel for the many-object tier: cluster-culled nearest-hit.

The demo-tier kernel (render_pallas) keeps its 6-sphere scene in SMEM
scalars; 10k spheres need a different shape. Design, driven by on-chip
measurement (grid-step floor ~2.5 us/step, pl.when ~0.1-1 us, pair math
at VPU peak after explicit broadcasts):

  * grid = (2048-ray tiles, PAGES of 8 subclusters) — few, fat steps
    (a subcluster-per-step grid spent 6.5 ms/trace on pure grid
    machinery; an XLA broad phase another 3.5 ms).
  * the whole packed geometry (ttrt.mesh.clusters, ~220 KB at 10k
    spheres) stays VMEM-RESIDENT for the entire launch; the 4D
    (C, KB, 8, 16) layout keeps the subcluster axis above the tiled
    dims so in-kernel dynamic indexing is legal.
  * culling happens IN-KERNEL: a branch-free conservative slab test of
    all 2048 tile rays against each subcluster's AABB (~30 instructions,
    clamped 1/d so axis-parallel rays only ever produce false
    POSITIVES; padding subclusters carry NaN boxes, and NaN comparisons
    are false, so they are always dead), then ONE pl.when per
    subcluster skips its ~8k-instruction narrow body. mode="dense"
    disables the test for scenes where everything is live anyway.

Pair-block shape: spheres ride SUBLANES, rays ride LANES. A subcluster is
16 (8, 1) component columns (static in-register slices); each pairs
against a pre-broadcast (8, 128) ray row as a native vreg with zero
transposes or gathers (explicit broadcasts matter: implicit (8,1)x(1,128)
ops re-materialized operands per op and ran 3x slower). Per-ray best
(t, id) accumulates in VMEM scratch as 8 SUBLANE-CLASS PARTIALS per ray;
the fold to a single winner happens once per tile at the last grid step.

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
from ttrt.mesh.clusters import GROUPS, SUBS, ClusterPack
from ttrt.mesh.grid import GridHit
from ttrt.vec import Vec3

_F32_MAX = float(np.finfo(np.float32).max)

TILE_ROWS = 16  # default ray tile = (TILE_ROWS, 128) = 2048 rays


def _col(block_comp, c):
    """Static (8, 1) column slice of a loaded (8, GROUPS) block."""
    return jax.lax.slice(block_comp, (0, c), (8, c + 1))


def _bcast_col(v):  # (8, 1) -> (8, 128), ONE explicit broadcast op
    return jnp.broadcast_to(v, (8, 128))


def _mesh_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (1, TR, 128) rays
    aabb_ref,  # SMEM flat (PAGES*SUBS*8,): lox loy loz hix hiy hiz pad pad
    sph_ref,  # (5, KBs, 8, 16) resident sphere table (or None)
    tri_ref,  # (17?, KBt, 8, 16) resident triangle table (or None)
    out_t_ref, out_id_ref,  # (1, TR, 128) per-tile winners
    bp_t, bp_id,  # VMEM scratch (TR*8, 128): sublane-class partials
    inv_s,  # VMEM scratch (TR*4, 128): per-row od, oo, 4a, inv2a
    *,
    kb_sph: int,
    kb_tri: int,
    pages: int,
    mode: str,
    tile_rows: int,
    spp_: int,  # subclusters per page (grid chunk factor)
):
    i = pl.program_id(0)
    p = pl.program_id(1)  # page of SUBS subclusters

    def ray_row(r):
        ox = jnp.broadcast_to(ox_ref[0, r : r + 1, :], (8, 128))
        oy = jnp.broadcast_to(oy_ref[0, r : r + 1, :], (8, 128))
        oz = jnp.broadcast_to(oz_ref[0, r : r + 1, :], (8, 128))
        dx = jnp.broadcast_to(dx_ref[0, r : r + 1, :], (8, 128))
        dy = jnp.broadcast_to(dy_ref[0, r : r + 1, :], (8, 128))
        dz = jnp.broadcast_to(dz_ref[0, r : r + 1, :], (8, 128))
        return ox, oy, oz, dx, dy, dz

    @pl.when(p == 0)
    def _init():
        bp_t[...] = jnp.full((tile_rows * 8, 128), _F32_MAX, jnp.float32)
        bp_id[...] = jnp.full((tile_rows * 8, 128), -1.0, jnp.float32)
        for r in range(tile_rows):
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

    # whole-tile ray views for the slab test: (TILE_ROWS, 128)
    oxt = ox_ref[0]
    oyt = oy_ref[0]
    ozt = oz_ref[0]
    dxt = dx_ref[0]
    dyt = dy_ref[0]
    dzt = dz_ref[0]
    eps = jnp.float32(1e-12)
    if mode == "cull":
        # conservative clamped 1/d: |d| floored at eps keeping sign, so
        # axis-parallel rays yield +-huge slab times -> only false
        # POSITIVES (lockstep-safe)
        def cinv(dc):
            m = jnp.maximum(jnp.abs(dc), eps)
            return 1.0 / jnp.where(dc >= 0.0, m, -m)

        ivx, ivy, ivz = cinv(dxt), cinv(dyt), cinv(dzt)

    def sub_live(s):
        if mode != "cull":
            return None
        # aabb_ref is FLAT (rows*8,) SMEM — a 2-D (rows, 8) SMEM window
        # lane-pads the minor dim to 512 B/row (16x), which overflowed
        # SMEM's 1 MB at the fused kernel's 100k tier (BENCH_r04)
        base = (p * spp_ + s) * 8
        lox = aabb_ref[base + 0]
        loy = aabb_ref[base + 1]
        loz = aabb_ref[base + 2]
        hix = aabb_ref[base + 3]
        hiy = aabb_ref[base + 4]
        hiz = aabb_ref[base + 5]
        t1 = (lox - oxt) * ivx
        t2 = (hix - oxt) * ivx
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        t1 = (loy - oyt) * ivy
        t2 = (hiy - oyt) * ivy
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        t1 = (loz - ozt) * ivz
        t2 = (hiz - ozt) * ivz
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        # NaN boxes (padding) make this comparison false on every lane
        return jnp.any(tf >= jnp.maximum(tn, 0.0))

    def sphere_sub(s):
        sub = jnp.minimum(p * spp_ + s, kb_sph - 1)
        cxp = sph_ref[0, sub]  # (8, 16) comps from resident VMEM
        cyp = sph_ref[1, sub]
        czp = sph_ref[2, sub]
        ccp = sph_ref[3, sub]
        idp = sph_ref[4, sub]
        for r in range(tile_rows):
            ox, oy, oz, dx, dy, dz = ray_row(r)
            od = jnp.broadcast_to(inv_s[r * 4 + 0 : r * 4 + 1, :],
                                  (8, 128))
            oo = jnp.broadcast_to(inv_s[r * 4 + 1 : r * 4 + 2, :],
                                  (8, 128))
            four_a = jnp.broadcast_to(inv_s[r * 4 + 2 : r * 4 + 3, :],
                                      (8, 128))
            inv2a = jnp.broadcast_to(inv_s[r * 4 + 3 : r * 4 + 4, :],
                                     (8, 128))
            bt = bp_t[r * 8 : (r + 1) * 8, :]
            bid = bp_id[r * 8 : (r + 1) * 8, :]
            for g in range(GROUPS):
                cx = _bcast_col(_col(cxp, g))  # (8, 128)
                cy = _bcast_col(_col(cyp, g))
                cz = _bcast_col(_col(czp, g))
                ccr2 = _bcast_col(_col(ccp, g))
                sid = _bcast_col(_col(idp, g))
                cd = cx * dx + cy * dy + cz * dz
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

    def tri_sub(s):
        sub = jnp.minimum(p * spp_ + s - kb_sph, kb_tri - 1)
        comps = [tri_ref[c, sub] for c in range(10)]  # (8, 16)
        for r in range(tile_rows):
            ox, oy, oz, dx, dy, dz = ray_row(r)
            bt = bp_t[r * 8 : (r + 1) * 8, :]
            bid = bp_id[r * 8 : (r + 1) * 8, :]
            for g in range(GROUPS):
                (v0x, v0y, v0z, e1x, e1y, e1z,
                 e2x, e2y, e2z, tid) = (
                    _bcast_col(_col(c, g)) for c in comps
                )
                # Moller-Trumbore, plane epsilons of c:680,685
                px = dy * e2z - dz * e2y
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

    for s in range(spp_):
        sub_global = p * spp_ + s  # traced
        if mode == "cull":
            live = sub_live(s)
            if kb_sph:
                cond = live & (sub_global < kb_sph) if kb_tri else live
                @pl.when(cond)
                def _s(s=s):
                    sphere_sub(s)
            if kb_tri:
                cond = live & (sub_global >= kb_sph) if kb_sph else live
                @pl.when(cond)
                def _t(s=s):
                    tri_sub(s)
        else:
            if kb_sph and kb_tri:
                @pl.when(sub_global < kb_sph)
                def _s(s=s):
                    sphere_sub(s)

                @pl.when(sub_global >= kb_sph)
                def _t(s=s):
                    tri_sub(s)
            elif kb_sph:
                sphere_sub(s)
            else:
                tri_sub(s)

    @pl.when(p == pages - 1)
    def _fold():
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 128), 0
        )
        out_t = jnp.full((tile_rows, 128), _F32_MAX, jnp.float32)
        out_id = jnp.full((tile_rows, 128), -1.0, jnp.float32)
        for r in range(tile_rows):
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
            out_t = jnp.where(row_iota == r, bt, out_t)
            out_id = jnp.where(row_iota == r, bid, out_id)
        out_t_ref[0] = out_t
        out_id_ref[0] = out_id


def _aabb_smem(pack: ClusterPack, pages: int, spp_: int) -> jnp.ndarray:
    """FLAT (pages*SUBS*8,) f32 SMEM table, row stride 8: lo xyz, hi
    xyz, 0, 0. Padding
    subclusters (beyond kb, or valid==0) get NaN boxes — the slab test's
    comparisons are then false on every lane, so they are never live."""
    kb = pack.kb_sph + pack.kb_tri
    lo = jnp.concatenate([pack.sph_lo, pack.tri_lo], axis=0)
    hi = jnp.concatenate([pack.sph_hi, pack.tri_hi], axis=0)
    valid = jnp.concatenate([pack.sph_valid, pack.tri_valid]) != 0
    nan = jnp.float32(jnp.nan)
    lo = jnp.where(valid[:, None], lo.astype(jnp.float32), nan)
    hi = jnp.where(valid[:, None], hi.astype(jnp.float32), nan)
    table = jnp.concatenate(
        [lo, hi, jnp.zeros((kb, 2), jnp.float32)], axis=1
    )
    pad = pages * spp_ - kb
    if pad:
        table = jnp.concatenate(
            [table, jnp.full((pad, 8), nan, jnp.float32)]
        )
    # FLAT layout: 4 B/elem in SMEM instead of 512 B/row (see sub_live)
    return table.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("kb_sph", "kb_tri", "interpret", "mode", "tile_rows",
                     "subs_per_page"),
)
def _cluster_nearest_padded(
    pack: ClusterPack,
    o6,  # 6 arrays (T, tile_rows, 128) f32
    kb_sph: int,
    kb_tri: int,
    interpret: bool = False,
    mode: str = "cull",
    tile_rows: int = TILE_ROWS,
    subs_per_page: int = SUBS,
):
    T = o6[0].shape[0]
    pages = -(-(kb_sph + kb_tri) // subs_per_page)
    ray_spec = pl.BlockSpec(
        (1, tile_rows, 128), lambda i, p: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    aabb = _aabb_smem(pack, pages, subs_per_page)
    geom_in = [aabb]
    geom_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if kb_sph:
        geom_in.append(pack.sph)
        geom_specs.append(pl.BlockSpec(
            pack.sph.shape, lambda i, p: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    if kb_tri:
        geom_in.append(pack.tri)
        geom_specs.append(pl.BlockSpec(
            pack.tri.shape, lambda i, p: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ))

    def kernel(*refs):
        rays = refs[:6]
        aabb_ref = refs[6]
        n = 7
        sph = refs[n] if kb_sph else None
        n += 1 if kb_sph else 0
        tri = refs[n] if kb_tri else None
        n += 1 if kb_tri else 0
        _mesh_kernel(*rays, aabb_ref, sph, tri, *refs[n:],
                     kb_sph=kb_sph, kb_tri=kb_tri, pages=pages, mode=mode,
                     tile_rows=tile_rows, spp_=subs_per_page)

    out_t, out_id = pl.pallas_call(
        kernel,
        grid=(T, pages),
        in_specs=[ray_spec] * 6 + geom_specs,
        out_specs=[
            pl.BlockSpec((1, tile_rows, 128), lambda i, p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows, 128), lambda i, p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, tile_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, tile_rows, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_rows * 8, 128), jnp.float32),
            pltpu.VMEM((tile_rows * 8, 128), jnp.float32),
            pltpu.VMEM((tile_rows * 4, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*o6, *geom_in)
    return out_t, out_id


def cluster_nearest(
    pack: ClusterPack, o: Vec3, d: Vec3, *, interpret: bool = False,
    mode: str = "cull", tile_rows: int = TILE_ROWS,
    subs_per_page: int = SUBS,
) -> GridHit:
    """Nearest (t, original object id) over the packed clusters. Drop-in
    for ttrt.mesh.dense.dense_nearest on scenes carrying a ClusterPack.
    Rays may be any count/direction (zero-padded to 2048-ray tiles; a
    zero direction yields a == 0 -> b == 0 -> no hit, so padding cannot
    win). ``mode``: "cull" (default, in-kernel per-subcluster AABB test +
    pl.when skip) or "dense" (branch-free exhaustive — faster when nearly
    everything is live)."""
    R = o.x.shape[0]
    ktile = tile_rows * 128
    T = -(-R // ktile)
    pad = T * ktile - R

    def p(x):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
        return x

    flat = [p(o.x), p(o.y), p(o.z), p(d.x), p(d.y), p(d.z)]
    o6 = tuple(x.reshape(T, tile_rows, 128) for x in flat)
    out_t, out_id = _cluster_nearest_padded(
        pack, o6, pack.kb_sph, pack.kb_tri, interpret, mode, tile_rows,
        subs_per_page,
    )
    t = out_t.reshape(-1)[:R]
    obj = out_id.reshape(-1)[:R].astype(jnp.int32)
    hit_ok = obj >= 0
    return GridHit(
        t=jnp.where(hit_ok, t, jnp.inf), obj=jnp.where(hit_ok, obj, -1)
    )
