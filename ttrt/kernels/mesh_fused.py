"""Monolithic fused Pallas kernel for the many-object tier: the WHOLE
frame — primary rays, every bounce, every shadow test, shading, sky —
in ONE pallas_call.

Round 2's architecture launched the cluster-culled nearest-hit kernel
(ttrt.kernels.mesh_pallas) once per trace: with B bounces and L lights
that is B*(1+L) separate launches per frame (~9-30), with the full ray
state round-tripping HBM between launches and the XLA integrator's
gather/shading epilogue after each — measured 4.1 Mray/s end-to-end on
the 10k tier while the demo-tier fused kernel does 2600. This kernel
keeps the packed geometry AND all per-ray bounce state VMEM-resident for
the entire frame, the way render_pallas does for the 6-sphere demo tier
(matching the reference's whole hot loop, project_scene,
TerminalRayTracer.c:966-1069, plus its acceleration roadmap item :30).

Structure (driven by the round-1/2 kernel lessons):

  * grid = (ray tiles, B+1 PHASES). Phase k sweeps the subclusters once,
    testing THREE ray sets per subcluster while its (8, 16) component
    pages are hot: the shadow rays of bounce k-1 (one any-hit test per
    light, sharing the origin-dependent half of the quadratic between
    lights) and the nearest-hit rays of bounce k. Phase 0 is
    nearest-only (no shadows yet), phase B shadow-only.
  * the subcluster sweep is a lax.fori_loop whose body carries NOTHING —
    all state lives in VMEM scratch refs — so the loop adds no vector
    carries (the round-2 Mosaic trap); the fat ~50k-op body amortizes
    the loop overhead that killed the thin-carry bounce loops.
  * subclusters are visited NEAR-TO-FAR in camera-distance order (a
    per-frame argsort staged through SMEM) in CHUNKS of four: the chunk's
    4 nearest + 4 shadow live flags per subcluster (at QUARTER = 32-object
    AABB granularity) are computed in the vector domain with per-ray
    CURRENT-BEST pruning, OR-folded, and extracted with ONE
    vector->scalar sync; the inner loop then branches on cheap scalar
    bit tests (each jnp.any->pl.when sync measures ~300 cycles — the
    original per-subcluster gating spent ~22% of the frame on them).
    Near-to-far ordering makes the best-t prune converge fast — once
    every ray has a nearer hit than the remaining boxes, the rest of the
    sweep is flag math only.
  * shading happens at phase boundaries entirely in-kernel: materials
    and triangle normals ride the cluster pack (ClusterPack rows 5..8 /
    10..16), carried through the nearest scan as sublane-class partials
    next to t, so there are NO per-object gathers anywhere.

Semantics are the XLA mesh path's exactly (trace_ray_mesh + the shared
integrator/lighting, themselves parity-tested against
TerminalRayTracer.c): sphere/triangle intersection quirks (c:638-695),
EPSILON back-offset (:870-874), un-clamped-below n.l (:911,:945), the
point-light occlusion comparison (:937-942) restructured as an any-hit
cutoff (same restructuring render_pallas documents), contribution-
weighted bounce accumulation (:1012-1065), deferred/procedural skybox
(:700-789).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttrt.config import ConfigError, RenderConfig, constants
from ttrt.kernels.render_pallas import (LANES, _normalize3,
                                        _sky_color_procedural,
                                        _sky_color_procedural_bilinear,
                                        _sky_texel_index,
                                        _sky_texel_index_bilinear,
                                        pack_camera, pack_dlights,
                                        pack_plights)
from ttrt.mesh.clusters import GROUPS, ClusterPack
from ttrt.render.skybox import fetch_packed_texels
from ttrt.vec import Vec3

_F32_MAX = float(np.finfo(np.float32).max)

TILE_ROWS = 16  # ray tile = (TILE_ROWS, 128) lanes


def _col(block, g):
    """Static (8, 1) column slice of a loaded (8, GROUPS) page."""
    return jax.lax.slice(block, (0, g), (8, g + 1))


def _b128(v):  # (8,1) or (1,128) -> (8,128), one explicit broadcast
    return jnp.broadcast_to(v, (8, LANES))


# ---------------------------------------------------------------------------
# Per-frame subcluster ordering (XLA, staged through SMEM)
# ---------------------------------------------------------------------------


def order_subclusters(pack: ClusterPack, origin: jnp.ndarray) -> jnp.ndarray:
    """(K,) int32 visit order over ALL subclusters (combined index space:
    spheres 0..kb_sph-1, triangles kb_sph..K-1), sorted by squared
    distance from ``origin`` to the AABB center. Invalid (fully-padded)
    subclusters sort last; their NaN AABBs fail every slab test, so they
    cost one test each and are never entered. Ordering is a pure
    OPTIMIZATION — any permutation yields identical output (asserted by
    tests) absent EXACT float-t ties between objects in different
    subclusters: the kernel's strict t0 < best tiebreak resolves such a
    tie to the first-visited (distance-ordered) object, the XLA oracle
    to the lower object id. Near-to-far merely makes the best-t prune
    converge fast."""
    lo = jnp.concatenate([pack.sph_lo, pack.tri_lo], axis=0)
    hi = jnp.concatenate([pack.sph_hi, pack.tri_hi], axis=0)
    valid = jnp.concatenate([pack.sph_valid, pack.tri_valid]) != 0
    c = 0.5 * (lo + hi)
    d2 = ((c - origin[None, :].astype(jnp.float32)) ** 2).sum(axis=-1)
    key = jnp.where(valid, d2, jnp.inf)
    return jnp.argsort(key).astype(jnp.int32)


def _aabb_table(pack: ClusterPack) -> jnp.ndarray:
    """(K*4, 8) f32 SMEM table of QUARTER AABBs: row sub*4+q is quarter
    q of subcluster sub (combined index space), columns lo xyz, hi xyz,
    0, 0. Quarters (32 Morton-consecutive objects = table groups
    4q..4q+3) are the kernel's fine culling granularity; all-padding
    quarters carry NaN boxes — every slab comparison is then false, so
    they are never live."""
    lo = jnp.concatenate([pack.sph_lo_q, pack.tri_lo_q], axis=0)
    hi = jnp.concatenate([pack.sph_hi_q, pack.tri_hi_q], axis=0)
    k4 = lo.shape[0] * lo.shape[1]
    lo = lo.reshape(k4, 3).astype(jnp.float32)
    hi = hi.reshape(k4, 3).astype(jnp.float32)
    return jnp.concatenate(
        [lo, hi, jnp.zeros((k4, 2), jnp.float32)], axis=1
    )


# Hierarchical (two-level) sweep: one union AABB per STATIC chunk of 4
# Morton/index-consecutive subclusters gates the whole chunk — 8 chunk
# bits per scalar sync — before the per-quarter flags run. Auto-enabled
# at this many subclusters: the round-5 on-chip breakdown measured the
# flat sweep's dead floor at 10.2 ms of a 31.3 ms production frame at
# the 100k tier (792 subclusters, scratch/fused_breakdown.py), while at
# the 10k tier (~80 subclusters) the floor is 1-2 ms and the interior
# camera keeps ~82% of sections live — there the super level is pure
# overhead, so the proven flat sweep stays.
SUPERCHUNK = 8
HIERARCHY_MIN_SUBCLUSTERS = 256


def _super_table(pack: ClusterPack) -> jnp.ndarray:
    """(NC, 8) f32 union AABBs of the static sweep chunks (chunk c =
    combined subclusters [c*4, c*4+4)); columns lo xyz, hi xyz, 0, 0.
    Chunks whose members are all padding carry NaN boxes. Membership is
    STATIC (index/Morton-consecutive) so the unions stay spatially tight
    — unions over the per-frame distance order would span whole distance
    shells and never cull."""
    lo = jnp.concatenate([pack.sph_lo, pack.tri_lo], axis=0)
    hi = jnp.concatenate([pack.sph_hi, pack.tri_hi], axis=0)
    valid = jnp.concatenate([pack.sph_valid, pack.tri_valid]) != 0
    k = lo.shape[0]
    nc = -(-k // 4)
    pad = nc * 4 - k
    lo = jnp.pad(lo, ((0, pad), (0, 0)))
    hi = jnp.pad(hi, ((0, pad), (0, 0)))
    valid = jnp.pad(valid, (0, pad))
    lo = jnp.where(valid[:, None], lo, jnp.inf).reshape(nc, 4, 3)
    hi = jnp.where(valid[:, None], hi, -jnp.inf).reshape(nc, 4, 3)
    slo, shi = lo.min(axis=1), hi.max(axis=1)
    ok = valid.reshape(nc, 4).any(axis=1)[:, None]
    slo = jnp.where(ok, slo, jnp.nan)
    shi = jnp.where(ok, shi, jnp.nan)
    return jnp.concatenate(
        [slo, shi, jnp.zeros((nc, 2), jnp.float32)], axis=1
    )


def order_chunks(super_tab: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """(NC,) int32 visit order over the static sweep chunks, sorted by
    squared distance from ``origin`` to the chunk union-box center
    (NaN/padding chunks last). Chunk-granularity near-to-far: the best-t
    prune converges almost as fast as the per-subcluster sort
    (order_subclusters) while keeping chunk membership static so the
    union boxes above can exist. Like the flat order, any permutation
    yields identical output absent exact float-t ties (asserted by
    tests)."""
    c = 0.5 * (super_tab[:, 0:3] + super_tab[:, 3:6])
    d2 = ((c - origin[None, :].astype(jnp.float32)) ** 2).sum(axis=-1)
    key = jnp.where(jnp.isnan(d2), jnp.inf, d2)
    return jnp.argsort(key).astype(jnp.int32)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _fused_kernel(
    cam_ref, dl_ref, pl_ref, order_ref, aabb_ref,  # SMEM
    sph_ref, tri_ref,  # VMEM resident geometry (either may be None)
    out_r, out_g, out_b, out_total, out_cnt, out_skyw,  # (1, TR, 128)
    st_ref, q_ref, cnt_ref,  # VMEM scratch
    out_wu=None, out_wv=None,  # (1, TR, 128) — textured bilinear only
    *,
    super_ref=None,  # SMEM flat chunk-union AABBs (hierarchy only)
    hierarchy: bool = False,
    cfg: RenderConfig,
    kb_sph: int,
    kb_tri: int,
    n_dl: int,
    n_pl: int,
    sky_dim: int,
    tile_rows: int,
    procedural: str,
    prune: bool,
    n_rows: int,
    n_samples: int,
    swizzle,
    stats: bool = False,
    debug_sweep: str = None,
):
    W, H, N = cfg.width, cfg.height, cfg.rays_per_pixel
    B = cfg.bounce_limit
    TR = tile_rows
    R8 = TR * 8
    K = kb_sph + kb_tri
    n_lights = n_dl + n_pl

    i = pl.program_id(0)  # ray tile
    ph = pl.program_id(1)  # phase (0..B)

    # ----- state slot map (all f32 rows of st_ref, each (TR, 128)) -----
    _c = iter(range(1000))
    OX, OY, OZ, DX, DY, DZ = (next(_c) for _ in range(6))
    POD, POO, PFA, PI2 = (next(_c) for _ in range(4))  # nearest precompute
    NIVX, NIVY, NIVZ = (next(_c) for _ in range(3))  # clamped 1/d (slab)
    HX, HY, HZ, SOO = (next(_c) for _ in range(4))  # shadow origin
    SDL_OD = [next(_c) for _ in range(n_dl)]  # o_s . dl_dir
    PL_BASE = [
        {k: next(_c) for k in
         ("pdx", "pdy", "pdz", "tmax", "d2", "od", "ivx", "ivy", "ivz")}
        for _ in range(n_pl)
    ]
    NX, NY, NZ = (next(_c) for _ in range(3))  # hit normal (unit)
    MCR, MCG, MCB = (next(_c) for _ in range(3))  # hit material color
    HW = next(_c)  # hit weight for the pending lighting
    specular = cfg.specular
    if specular:  # Blinn-Phong extension (TerminalRayTracer.c:913-916)
        MSPEC = next(_c)  # winner material specularity
        VX, VY, VZ = (next(_c) for _ in range(3))  # view = -incoming d
    APR, APG, APB = (next(_c) for _ in range(3))  # accumulators
    ATOT, ASKYW, ACON = (next(_c) for _ in range(3))
    BTF = next(_c)  # folded best-t (pruning)
    SFOLD = [next(_c) for _ in range(n_lights)]  # folded blocked masks
    NS = next(_c)
    assert st_ref.shape[0] == NS * TR, (st_ref.shape, NS, TR)

    def sget(k):
        return st_ref[k * TR:(k + 1) * TR, :]

    def sset(k, v):
        st_ref[k * TR:(k + 1) * TR, :] = v

    def srow(k, r):  # (8, 128) broadcast of one state row
        return jnp.broadcast_to(st_ref[k * TR + r: k * TR + r + 1, :],
                                (8, LANES))

    def srow_set(k, r, v):  # write one (1, 128) state row
        st_ref[k * TR + r: k * TR + r + 1, :] = v

    # ----- partial slot map (rows of q_ref, each (R8, 128)) -----
    QT, QFL, QN1, QN2, QN3, QCR, QCG, QCB, QRF = range(9)
    QNEAREST = (QT, QFL, QN1, QN2, QN3, QCR, QCG, QCB, QRF)
    if specular:
        QSPEC = 9
        QNEAREST = QNEAREST + (QSPEC,)
    nq_base = len(QNEAREST)
    QSH = [nq_base + j for j in range(n_lights)]
    NQ = nq_base + n_lights

    def qrow(qi, r):  # (8, 128) class-partial row r
        return q_ref[qi * R8 + r * 8: qi * R8 + (r + 1) * 8, :]

    def qrow_set(qi, r, v):
        q_ref[qi * R8 + r * 8: qi * R8 + (r + 1) * 8, :] = v

    def cinv(dc):
        # conservative clamped 1/d: |d| floored keeping sign, so
        # axis-parallel rays yield +-huge slab times -> false POSITIVES
        # only (lockstep-safe); see mesh_pallas.
        m = jnp.maximum(jnp.abs(dc), 1e-12)
        return 1.0 / jnp.where(dc >= 0.0, m, -m)

    def reset_sweep_state():
        q_ref[QT * R8:(QT + 1) * R8, :] = jnp.full(
            (R8, LANES), _F32_MAX, jnp.float32
        )
        for qi in (*QNEAREST[1:], *QSH):
            q_ref[qi * R8:(qi + 1) * R8, :] = jnp.zeros(
                (R8, LANES), jnp.float32
            )
        sset(BTF, jnp.full((TR, LANES), _F32_MAX, jnp.float32))
        for k in SFOLD:
            sset(k, jnp.zeros((TR, LANES), jnp.float32))

    def store_ray_precompute():
        ox, oy, oz = sget(OX), sget(OY), sget(OZ)
        dx, dy, dz = sget(DX), sget(DY), sget(DZ)
        a = dx * dx + dy * dy + dz * dz
        sset(POD, ox * dx + oy * dy + oz * dz)
        sset(POO, ox * ox + oy * oy + oz * oz)
        sset(PFA, 4.0 * a)
        sset(PI2, 0.5 / a)
        sset(NIVX, cinv(dx))
        sset(NIVY, cinv(dy))
        sset(NIVZ, cinv(dz))

    # ------------------------------------------------------------------
    # Phase-boundary pieces
    # ------------------------------------------------------------------

    @pl.when(ph == 0)
    def _init():
        # --- primary ray generation (project_scene ray setup,
        # TerminalRayTracer.c:978-1011; same sample-major lane order and
        # band/sample offsets as render_pallas._render_kernel).
        n_rays = W * n_rows * n_samples
        lane = (
            jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1)
        )
        if swizzle is not None:
            # SQUARE pixel tiles: tile i covers a (TH, TW) pixel block x
            # all AA samples (sample = the slow within-tile axis). A
            # linear tile is a thin W x ~(2048/W) slab whose frustum
            # spans the whole image width; a square tile's frustum is
            # ~TWxTH pixels, so the tile-level slab cull and best-t
            # prune reject far more subclusters. The host epilogue
            # unscrambles with a static permutation.
            TW_, TH_ = swizzle
            tiles_x = pl.cdiv(W, TW_)
            pp = TH_ * TW_
            k_i = lane // pp
            rem = lane - k_i * pp
            ty = rem // TW_
            tx = rem - ty * TW_
            colv = (i % tiles_x) * TW_ + tx
            rowv = (i // tiles_x) * TH_ + ty
            lane_valid = (colv < W) & (rowv < n_rows)
            k = k_i.astype(jnp.float32) + cam_ref[16]
            col = colv.astype(jnp.float32)
            row = rowv.astype(jnp.float32) + cam_ref[15]
        else:
            idx = i * (TR * LANES) + lane
            lane_valid = idx < n_rays
            n_pixels = W * n_rows
            k = (idx // n_pixels).astype(jnp.float32) + cam_ref[16]
            pix = idx % n_pixels
            col = (pix % W).astype(jnp.float32)
            row = (pix // W).astype(jnp.float32) + cam_ref[15]

        bx0, bx1, bx2 = cam_ref[0], cam_ref[1], cam_ref[2]
        by0, by1, by2 = cam_ref[3], cam_ref[4], cam_ref[5]
        bz0, bz1, bz2 = cam_ref[6], cam_ref[7], cam_ref[8]
        cox, coy, coz = cam_ref[9], cam_ref[10], cam_ref[11]
        szc, sw, sh = cam_ref[12], cam_ref[13], cam_ref[14]
        pixel_w = sw / W
        pixel_h = sh / H

        def tri_wave(t):
            m = jnp.mod(t, 2.0 * constants.PI)
            return jnp.where(
                m < constants.PI, m / constants.PI, 2.0 - m / constants.PI
            )

        jit_x = tri_wave(2.0 * constants.PI * k / N) / 2.0 * pixel_w
        jit_y = tri_wave(constants.PI * k / N) / 2.0 * pixel_h
        sxv = (col / W) * sw - sw / 2.0 + jit_x
        syv = -((row / H) * sh - sh / 2.0) + jit_y
        dx, dy, dz = _normalize3(
            sxv * bx0 + syv * by0 + szc * bz0 - cox,
            sxv * bx1 + syv * by1 + szc * bz1 - coy,
            sxv * bx2 + syv * by2 + szc * bz2 - coz,
        )
        sset(OX, jnp.full((TR, LANES), cox, jnp.float32))
        sset(OY, jnp.full((TR, LANES), coy, jnp.float32))
        sset(OZ, jnp.full((TR, LANES), coz, jnp.float32))
        sset(DX, dx)
        sset(DY, dy)
        sset(DZ, dz)
        store_ray_precompute()
        zero = jnp.zeros((TR, LANES), jnp.float32)
        for k2 in (APR, APG, APB, ATOT, ASKYW, HW, NX, NY, NZ, MCR, MCG,
                   MCB, HX, HY, HZ, SOO, *SDL_OD,
                   *((MSPEC, VX, VY, VZ) if specular else ())):
            sset(k2, zero)
        for d in PL_BASE:
            for k2 in d.values():
                sset(k2, zero)
        sset(ACON, jnp.where(lane_valid, 1.0, 0.0).astype(jnp.float32))
        cnt_ref[...] = jnp.zeros((TR, LANES), jnp.int32)
        reset_sweep_state()

    def lighting_from_folds():
        """Shade the PENDING bounce (hit attrs in state, blocked masks in
        the shadow folds) and accumulate hw-weighted into the pixel
        (apply_lighting, TerminalRayTracer.c:894-963)."""
        nx, ny, nz = sget(NX), sget(NY), sget(NZ)
        mcr, mcg, mcb = sget(MCR), sget(MCG), sget(MCB)
        hw = sget(HW)
        clamp01 = lambda v: jnp.minimum(jnp.maximum(v, 0.0), 1.0)
        if specular:
            vx, vy, vz = sget(VX), sget(VY), sget(VZ)
            mspec = sget(MSPEC)
        litr = jnp.zeros((TR, LANES), jnp.float32)
        litg = jnp.zeros((TR, LANES), jnp.float32)
        litb = jnp.zeros((TR, LANES), jnp.float32)
        for li in range(n_dl):
            lx, ly, lz = (dl_ref[li * 6 + c] for c in range(3))
            lcr, lcg, lcb = (dl_ref[li * 6 + 3 + c] for c in range(3))
            blocked = sget(SFOLD[li]) > 0.0
            ndotl = jnp.minimum(nx * lx + ny * ly + nz * lz, 1.0)  # c:911
            cr = lcr * ndotl * mcr
            cg = lcg * ndotl * mcg
            cb = lcb * ndotl * mcb
            if specular:
                # reference's commented-out Blinn-Phong (c:913-916),
                # op-for-op with render_pallas._apply_lighting
                hvx, hvy, hvz = _normalize3(lx + vx, ly + vy, lz + vz)
                s = jnp.power(
                    clamp01(nx * hvx + ny * hvy + nz * hvz), mspec
                )
                cr = cr + lcr * s
                cg = cg + lcg * s
                cb = cb + lcb * s
            litr = litr + jnp.where(blocked, 0.0, cr)
            litg = litg + jnp.where(blocked, 0.0, cg)
            litb = litb + jnp.where(blocked, 0.0, cb)
        for lj in range(n_pl):
            d = PL_BASE[lj]
            lcr, lcg, lcb = (pl_ref[lj * 7 + 3 + c] for c in range(3))
            inten_s = pl_ref[lj * 7 + 6]
            light_d2 = sget(d["d2"])
            inten = jnp.minimum(
                jnp.maximum(inten_s / light_d2, 0.0), 1.0
            )  # c:931
            pdx, pdy, pdz = sget(d["pdx"]), sget(d["pdy"]), sget(d["pdz"])
            blocked = sget(SFOLD[n_dl + lj]) > 0.0
            ndotl = jnp.minimum(nx * pdx + ny * pdy + nz * pdz, 1.0)
            scale = inten * ndotl
            cr = lcr * scale * mcr
            cg = lcg * scale * mcg
            cb = lcb * scale * mcb
            if specular:
                hvx, hvy, hvz = _normalize3(
                    pdx + vx, pdy + vy, pdz + vz
                )
                s = inten * jnp.power(
                    clamp01(nx * hvx + ny * hvy + nz * hvz), mspec
                )
                cr = cr + lcr * s
                cg = cg + lcg * s
                cb = cb + lcb * s
            litr = litr + jnp.where(blocked, 0.0, cr)
            litg = litg + jnp.where(blocked, 0.0, cg)
            litb = litb + jnp.where(blocked, 0.0, cb)
        # final clamp c:960
        sset(APR, sget(APR) + hw * clamp01(litr))
        sset(APG, sget(APG) + hw * clamp01(litg))
        sset(APB, sget(APB) + hw * clamp01(litb))

    def fold_nearest():
        """Fold the sublane-class partials to per-ray winners: (TR,128)
        arrays (t, is_tri, n1..3, cr, cg, cb, refl)."""
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0)
        outs = [
            jnp.full((TR, LANES), _F32_MAX, jnp.float32)
        ] + [
            jnp.zeros((TR, LANES), jnp.float32)
            for _ in range(len(QNEAREST) - 1)
        ]
        qis = QNEAREST
        for r in range(TR):
            vals = [qrow(qi, r) for qi in qis]
            for h in (4, 2, 1):
                t_lo = vals[0][0:h, :]
                t_hi = vals[0][h:2 * h, :]
                tk = t_hi < t_lo
                vals = [
                    jnp.where(tk, v[h:2 * h, :], v[0:h, :]) for v in vals
                ]
            outs = [
                jnp.where(row_iota == r, v, o) for v, o in zip(vals, outs)
            ]
        return outs

    def fold_and_setup():
        """Consume the just-swept nearest partials: hit fixups, bounce
        accounting, reflected continuation ray, shadow-ray setup
        (trace_ray fixups c:858-886 + project_scene bookkeeping
        c:1012-1057, identical op order to the jnp oracle)."""
        folded = fold_nearest()
        bt, bfl, bn1, bn2, bn3, bcr, bcg, bcb, brf = folded[:9]
        ox, oy, oz = sget(OX), sget(OY), sget(OZ)
        dx, dy, dz = sget(DX), sget(DY), sget(DZ)
        acon = sget(ACON)
        alive = acon > constants.CONTRIBUTION_EPS
        hit = alive & (bt < _F32_MAX)
        t = jnp.where(hit, bt, 0.0)
        px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
        tox, toy, toz = _normalize3(ox - px, oy - py, oz - pz)
        eps = constants.EPSILON
        pxo = jnp.where(hit, px + tox * eps, ox)
        pyo = jnp.where(hit, py + toy * eps, oy)
        pzo = jnp.where(hit, pz + toz * eps, oz)
        is_tri = bfl > 0.5
        nrx = jnp.where(is_tri, bn1, px - bn1)
        nry = jnp.where(is_tri, bn2, py - bn2)
        nrz = jnp.where(is_tri, bn3, pz - bn3)
        nx, ny, nz = _normalize3(
            jnp.where(hit, nrx, dx),
            jnp.where(hit, nry, dy),
            jnp.where(hit, nrz, dz),
        )
        miss_now = alive & ~hit
        upd = alive & hit
        sset(ATOT, sget(ATOT) + jnp.where(alive, acon, 0.0))
        sset(ASKYW, jnp.where(miss_now, acon, sget(ASKYW)))
        if cfg.energy_model == "subtract":
            # roadmap mixing model (TerminalRayTracer.c:24-28): local
            # shading weighted by (1 - reflectivity); epilogue skips the
            # contribution-total normalization
            hw = jnp.where(upd, acon * (1.0 - brf), 0.0)
        else:
            hw = jnp.where(upd, acon, 0.0)
        sset(HW, hw)
        sset(ACON, jnp.where(alive, jnp.where(upd, acon * brf, 0.0), acon))
        cnt_ref[...] = cnt_ref[...] + alive.astype(jnp.int32) + (
            upd.astype(jnp.int32) << 5
        )
        sset(NX, nx)
        sset(NY, ny)
        sset(NZ, nz)
        sset(MCR, bcr)
        sset(MCG, bcg)
        sset(MCB, bcb)
        if specular:
            sset(MSPEC, folded[9])
            # view vector for the pending Blinn-Phong: -incoming d
            # (integrator.py body: view = -s.d), saved BEFORE the
            # reflection overwrites the direction state
            sset(VX, -dx)
            sset(VY, -dy)
            sset(VZ, -dz)
        # reflected continuation ray, frozen on dead/miss lanes
        dn = 2.0 * (dx * nx + dy * ny + dz * nz)
        rdx, rdy, rdz = _normalize3(
            dx - dn * nx, dy - dn * ny, dz - dn * nz
        )
        sset(DX, jnp.where(upd, rdx, dx))
        sset(DY, jnp.where(upd, rdy, dy))
        sset(DZ, jnp.where(upd, rdz, dz))
        sset(OX, jnp.where(upd, pxo, ox))
        sset(OY, jnp.where(upd, pyo, oy))
        sset(OZ, jnp.where(upd, pzo, oz))
        store_ray_precompute()
        # shadow rays originate at the offset hit point (origin on miss,
        # matching the oracle's point-out fixup; those lanes are hw=0)
        hx, hy, hz = pxo, pyo, pzo
        sset(HX, hx)
        sset(HY, hy)
        sset(HZ, hz)
        sset(SOO, hx * hx + hy * hy + hz * hz)
        for li in range(n_dl):
            lx, ly, lz = (dl_ref[li * 6 + c] for c in range(3))
            sset(SDL_OD[li], hx * lx + hy * ly + hz * lz)
        for lj in range(n_pl):
            d = PL_BASE[lj]
            lpx, lpy, lpz = (pl_ref[lj * 7 + c] for c in range(3))
            lvx, lvy, lvz = lpx - hx, lpy - hy, lpz - hz
            d2 = lvx * lvx + lvy * lvy + lvz * lvz
            pdx, pdy, pdz = _normalize3(lvx, lvy, lvz)
            sset(d["pdx"], pdx)
            sset(d["pdy"], pdy)
            sset(d["pdz"], pdz)
            sset(d["d2"], d2)
            sset(d["tmax"], jnp.sqrt(d2))
            sset(d["od"], hx * pdx + hy * pdy + hz * pdz)
            sset(d["ivx"], cinv(pdx))
            sset(d["ivy"], cinv(pdy))
            sset(d["ivz"], cinv(pdz))

    @pl.when(ph > 0)
    def _boundary():
        @pl.when(ph >= 2)
        def _():
            lighting_from_folds()

        fold_and_setup()
        reset_sweep_state()

    # ------------------------------------------------------------------
    # The subcluster sweep (fori over the distance-ordered subclusters)
    # ------------------------------------------------------------------

    def slab(lox, loy, loz, hix, hiy, hiz, o3, iv3, tmax=None):
        """(TR,128) slab pass mask + entry times for one ray set. NaN
        boxes (invalid subclusters) fail every comparison."""
        ox_, oy_, oz_ = o3
        ivx, ivy, ivz = iv3
        t1 = (lox - ox_) * ivx
        t2 = (hix - ox_) * ivx
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        t1 = (loy - oy_) * ivy
        t2 = (hiy - oy_) * ivy
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        t1 = (loz - oz_) * ivz
        t2 = (hiz - oz_) * ivz
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        ok = tf >= jnp.maximum(tn, 0.0)
        if tmax is not None:
            ok = ok & (tn <= tmax)
        return ok, tn

    def sphere_nearest(sub_s, grange):
        """Narrow-test the subcluster's 128 spheres against all TR ray
        rows. Straight-line only: a per-row pl.when gate was measured
        CATASTROPHIC on-chip (16.4 -> 39.3 ms/frame at the 10k tier —
        each scalar branch costs ~300 cycles, and 16 of them per body
        swamp the culled work). Culling lives at tile granularity."""
        mat_rows = (0, 1, 2, 3, 5, 6, 7, 8, 9) if specular else (
            0, 1, 2, 3, 5, 6, 7, 8)
        pages = [sph_ref[c, sub_s] for c in mat_rows]
        for r in range(TR):
            if True:  # (kept indentation; no per-row gate — see docstring)
                ox, oy, oz = srow(OX, r), srow(OY, r), srow(OZ, r)
                dx, dy, dz = srow(DX, r), srow(DY, r), srow(DZ, r)
                pod, poo = srow(POD, r), srow(POO, r)
                pfa, pi2 = srow(PFA, r), srow(PI2, r)
                vals = [qrow(qi, r) for qi in QNEAREST]
                bt = vals[0]
                for g in grange:
                    cx = _b128(_col(pages[0], g))
                    cy = _b128(_col(pages[1], g))
                    cz = _b128(_col(pages[2], g))
                    ccr2 = _b128(_col(pages[3], g))
                    # winner attrs aligned with QNEAREST[1:]: is_tri=0,
                    # n1..3 = center, then the material pages
                    attrs = [0.0, cx, cy, cz] + [
                        _b128(_col(p, g)) for p in pages[4:]
                    ]
                    cd = cx * dx + cy * dy + cz * dz
                    co = cx * ox + cy * oy + cz * oz
                    b = 2.0 * (pod - cd)
                    cc = poo - 2.0 * co + ccr2
                    disc = b * b - pfa * cc
                    hit = (disc >= 0.0) & (b < 0.0) & (cc > 0.0)
                    t0 = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) * pi2
                    take = hit & (t0 < bt)
                    bt = jnp.where(take, t0, bt)
                    vals = [bt] + [
                        jnp.where(take, a, v)
                        for a, v in zip(attrs, vals[1:])
                    ]
                for qi, v in zip(QNEAREST, vals):
                    qrow_set(qi, r, v)
                # per-row best-t fold update (prune key)
                v = bt
                for h in (4, 2, 1):
                    v = jnp.minimum(v[0:h, :], v[h:2 * h, :])
                srow_set(BTF, r, jnp.minimum(
                    st_ref[BTF * TR + r: BTF * TR + r + 1, :], v
                ))

    def tri_nearest(sub_t, grange):
        rows = (0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16)
        if specular:
            rows = rows + (17,)
        comps = [tri_ref[c, sub_t] for c in rows]
        for r in range(TR):
            _tri_nearest_row(comps, r, grange)

    def _tri_nearest_row(comps, r, grange):
            ox, oy, oz = srow(OX, r), srow(OY, r), srow(OZ, r)
            dx, dy, dz = srow(DX, r), srow(DY, r), srow(DZ, r)
            vals = [qrow(qi, r) for qi in QNEAREST]
            bt = vals[0]
            for g in grange:
                cols = [_b128(_col(c, g)) for c in comps]
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = cols[:9]
                # winner attrs aligned with QNEAREST[1:]: is_tri=1,
                # normal xyz, then material cr cg cb refl (spec)
                attrs = [1.0] + cols[9:]
                # Moller-Trumbore with the reference's plane epsilons
                # (c:680,685), as ttrt.mesh.triangles.ray_triangle
                px_ = dy * e2z - dz * e2y
                py_ = dz * e2x - dx * e2z
                pz_ = dx * e2y - dy * e2x
                det = e1x * px_ + e1y * py_ + e1z * pz_
                ok = jnp.abs(det) > constants.PLANE_DENOM_EPS
                inv = 1.0 / jnp.where(ok, det, 1.0)
                sx = ox - v0x
                sy = oy - v0y
                sz = oz - v0z
                u = (sx * px_ + sy * py_ + sz * pz_) * inv
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
                vals = [bt] + [
                    jnp.where(take, a, v)
                    for a, v in zip(attrs, vals[1:])
                ]
            for qi, v in zip(QNEAREST, vals):
                qrow_set(qi, r, v)
            v = bt
            for h in (4, 2, 1):
                v = jnp.minimum(v[0:h, :], v[h:2 * h, :])
            srow_set(BTF, r, jnp.minimum(
                st_ref[BTF * TR + r: BTF * TR + r + 1, :], v
            ))

    def sphere_shadow(sub_s, grange):
        pages = [sph_ref[c, sub_s] for c in (0, 1, 2, 3)]
        for r in range(TR):
            _sphere_shadow_row(pages, r, grange)

    def _sphere_shadow_row(pages, r, grange):
            hx, hy, hz = srow(HX, r), srow(HY, r), srow(HZ, r)
            soo = srow(SOO, r)
            sh = [qrow(q, r) for q in QSH]
            for g in grange:
                cx = _b128(_col(pages[0], g))
                cy = _b128(_col(pages[1], g))
                cz = _b128(_col(pages[2], g))
                ccr2 = _b128(_col(pages[3], g))
                co = cx * hx + cy * hy + cz * hz
                cc = soo - 2.0 * co + ccr2
                ccpos = cc > 0.0
                for li in range(n_dl):
                    lx, ly, lz = (dl_ref[li * 6 + c] for c in range(3))
                    cd = cx * lx + cy * ly + cz * lz
                    b = 2.0 * (srow(SDL_OD[li], r) - cd)
                    disc = b * b - 4.0 * cc
                    hit = (disc >= 0.0) & (b < 0.0) & ccpos
                    sh[li] = jnp.where(hit, 1.0, sh[li])
                for lj in range(n_pl):
                    d = PL_BASE[lj]
                    pdx = srow(d["pdx"], r)
                    pdy = srow(d["pdy"], r)
                    pdz = srow(d["pdz"], r)
                    cd = cx * pdx + cy * pdy + cz * pdz
                    b = 2.0 * (srow(d["od"], r) - cd)
                    disc = b * b - 4.0 * cc
                    # t0 < tmax via the sqrt-free squared form
                    # (render_pallas._shadow_any_hit, a == 1)
                    rhs = -b - 2.0 * srow(d["tmax"], r)
                    hit = (
                        (disc >= 0.0) & (b < 0.0) & ccpos
                        & ((rhs < 0.0) | (disc > rhs * rhs))
                    )
                    sh[n_dl + lj] = jnp.where(hit, 1.0, sh[n_dl + lj])
            for q, v in zip(QSH, sh):
                qrow_set(q, r, v)
            _sh_fold_row(sh, r)

    def _sh_fold_row(sh, r):
            # per-row blocked-mask fold into SFOLD (the shadow prune key)
            for v, k in zip(sh, SFOLD):
                for h in (4, 2, 1):
                    v = jnp.maximum(v[0:h, :], v[h:2 * h, :])
                srow_set(k, r, jnp.maximum(
                    st_ref[k * TR + r: k * TR + r + 1, :], v
                ))

    def tri_shadow(sub_t, grange):
        comps = [tri_ref[c, sub_t] for c in range(9)]
        for r in range(TR):
            _tri_shadow_row(comps, r, grange)

    def _tri_shadow_row(comps, r, grange):
            hx, hy, hz = srow(HX, r), srow(HY, r), srow(HZ, r)
            sh = [qrow(q, r) for q in QSH]
            for g in grange:
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = (
                    _b128(_col(c, g)) for c in comps
                )
                sx = hx - v0x
                sy = hy - v0y
                sz = hz - v0z
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x

                def mt(dx_, dy_, dz_, tmax_rows=None):
                    px_ = dy_ * e2z - dz_ * e2y
                    py_ = dz_ * e2x - dx_ * e2z
                    pz_ = dx_ * e2y - dy_ * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    ok = jnp.abs(det) > constants.PLANE_DENOM_EPS
                    inv = 1.0 / jnp.where(ok, det, 1.0)
                    u = (sx * px_ + sy * py_ + sz * pz_) * inv
                    v = (dx_ * qx + dy_ * qy + dz_ * qz) * inv
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                    hit = (
                        ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (tt > constants.PLANE_T_EPS)
                    )
                    if tmax_rows is not None:
                        hit = hit & (tt < tmax_rows)
                    return hit

                for li in range(n_dl):
                    lx, ly, lz = (dl_ref[li * 6 + c] for c in range(3))
                    one = jnp.ones((8, LANES), jnp.float32)
                    hit = mt(lx * one, ly * one, lz * one)
                    sh[li] = jnp.where(hit, 1.0, sh[li])
                for lj in range(n_pl):
                    d = PL_BASE[lj]
                    hit = mt(
                        srow(d["pdx"], r), srow(d["pdy"], r),
                        srow(d["pdz"], r), srow(d["tmax"], r),
                    )
                    sh[n_dl + lj] = jnp.where(hit, 1.0, sh[n_dl + lj])
            for q, v in zip(QSH, sh):
                qrow_set(q, r, v)
            _sh_fold_row(sh, r)

    # The sweep runs in CHUNKS of 8 subclusters. Round-3 profiling (see
    # scratch/fused_breakdown.py + README roofline notes): the original
    # one-subcluster-at-a-time sweep paid ~2 vector->scalar syncs per
    # subcluster per (tile, phase) — each jnp.any() reduction that feeds
    # a pl.when stalls the vector pipeline ~300 cycles — totalling
    # ~3.5 ms/frame at the 10k bench tier, 22% of the frame. The chunked
    # sweep computes FOUR subclusters' live flags at QUARTER granularity
    # (4 nearest + 4 shadow bits per subcluster, byte j = chunk member
    # j) entirely in the vector domain, OR-folds them across
    # sublanes/lanes, and extracts the packed mask with ONE scalar sync;
    # the inner 4-iteration fori then branches on cheap scalar bit
    # tests, running only the LIVE 32-object quarters of each narrow
    # body. Semantics are IDENTICAL (quarter keep masks are
    # conservative slab tests exactly like the old per-subcluster mask,
    # just on tighter boxes; the best-t prune reads a <=3-subcluster-
    # stale BTF, which only ever widens the conservative keep set).
    CHUNK = 4
    NQ4 = 4  # quarters per subcluster (clusters.QUARTERS)

    def _bit(b):  # int32 constant with bit b set (b=31 = the sign bit)
        return jnp.int32(np.int32(np.uint32(1 << b)))

    def _fold_mask(bits):
        # cross-sublane / cross-lane OR fold, then one scalar extraction
        v = bits
        h = TR // 2
        while h >= 1:
            v = v[0:h, :] | v[h:2 * h, :]
            h //= 2
        for sh in (64, 32, 16, 8, 4, 2, 1):
            v = v | pltpu.roll(v, sh, 1)
        # all lanes equal after the fold — but the packed mask may have
        # the SIGN bit set (bit 31 = j3/q3 shadow), so extract with a
        # bitwise-OR-preserving reduction: lanes are equal, min == value
        return jnp.min(v)

    def _sub(c, j):
        # visit-slot -> combined subcluster id. The flat sweep's order
        # table holds SUBCLUSTER ids (chunk c = order slots 4c..4c+3);
        # the hierarchical sweep's holds STATIC CHUNK ids (chunk cid =
        # subclusters [cid*4, cid*4+4), Morton/index-consecutive so the
        # super union boxes stay tight).
        if hierarchy:
            return order_ref[c] * CHUNK + j
        return order_ref[c * CHUNK + j]

    def _qbox(sub, q):
        # aabb_ref is FLAT (rows*8,) SMEM — 2-D SMEM windows lane-pad
        # the minor dim 16x, which overflowed SMEM at the 100k tier
        base = (sub * NQ4 + q) * 8
        return (
            aabb_ref[base + 0], aabb_ref[base + 1], aabb_ref[base + 2],
            aabb_ref[base + 3], aabb_ref[base + 4], aabb_ref[base + 5],
        )

    def chunk_flags(c):
        """Packed int32 live-bit mask for chunk ``c`` — one sync total.
        Byte j holds subcluster order[c*4+j]: bits j*8+q = quarter q
        nearest-live, j*8+4+q = quarter q shadow-live. Quarter boxes are
        the fine culling granularity (32 Morton-consecutive objects =
        table groups 4q..4q+3); a NaN quarter box (padding) fails every
        comparison."""
        nearest_on = ph < B
        shadow_on = ph > 0
        alive = sget(ACON) > constants.CONTRIBUTION_EPS
        btf = sget(BTF)
        o3 = (sget(OX), sget(OY), sget(OZ))
        iv3 = (sget(NIVX), sget(NIVY), sget(NIVZ))
        h3 = (sget(HX), sget(HY), sget(HZ))
        hw_pos = sget(HW) > 0.0
        pend_dl = [
            hw_pos & (sget(SFOLD[li]) == 0.0) for li in range(n_dl)
        ]
        pend_pl = [
            hw_pos & (sget(SFOLD[n_dl + lj]) == 0.0) for lj in range(n_pl)
        ]
        dl_iv = [
            tuple(cinv(dl_ref[li * 6 + cc]) for cc in range(3))
            for li in range(n_dl)
        ]
        pl_iv = [
            (sget(d["ivx"]), sget(d["ivy"]), sget(d["ivz"]))
            for d in PL_BASE
        ]
        pl_tmax = [sget(d["tmax"]) for d in PL_BASE]
        bits = jnp.zeros((TR, LANES), jnp.int32)
        for j in range(CHUNK):
            sub = _sub(c, j)
            for q in range(NQ4):
                box = _qbox(sub, q)
                ok, tn = slab(*box, o3, iv3)
                keep = ok & alive
                if prune:
                    # skip boxes entirely beyond every live ray's
                    # current best (margin vs fp slop in tn)
                    keep = keep & (tn <= btf * 1.001 + 1e-3)
                bits = bits | jnp.where(
                    keep & nearest_on, _bit(j * 8 + q), 0
                )
                skeep = jnp.zeros((TR, LANES), jnp.bool_)
                for li in range(n_dl):
                    ok, _tn = slab(*box, h3, dl_iv[li])
                    skeep = skeep | (ok & pend_dl[li])
                for lj in range(n_pl):
                    ok, _tn = slab(
                        *box, h3, pl_iv[lj], tmax=pl_tmax[lj]
                    )
                    skeep = skeep | (ok & pend_pl[lj])
                bits = bits | jnp.where(
                    skeep & shadow_on, _bit(j * 8 + 4 + q), 0
                )
        if debug_sweep == "dead":  # perf-lab knob: overhead floor
            bits = bits & 0
        elif debug_sweep == "all":  # perf-lab knob: body ceiling
            # every body live, but the phase gates still apply (phase 0
            # runs no shadow bodies, phase B no nearest bodies)
            gate = jnp.where(
                nearest_on, jnp.int32(0x0F0F0F0F), 0
            )
            gate = gate | jnp.where(
                shadow_on, jnp.int32(np.int32(np.uint32(0xF0F0F0F0))), 0
            )
            bits = jnp.broadcast_to(gate, bits.shape)
        return _fold_mask(bits)

    def chunk_body(c, _):
        bits = chunk_flags(c)

        @pl.when(bits != 0)
        def _run():
            def inner(j, _2):
                sub = _sub(c, j)
                if kb_sph and kb_tri:
                    is_sph = sub < kb_sph
                else:
                    is_sph = kb_sph > 0  # static
                sub_s = jnp.minimum(sub, kb_sph - 1) if kb_sph else 0
                sub_t = (
                    jnp.clip(sub - kb_sph, 0, kb_tri - 1) if kb_tri else 0
                )
                jbyte = jax.lax.shift_right_logical(
                    bits, (j * 8).astype(jnp.int32)
                )
                nbits = [
                    ((jbyte >> q) & 1) != 0 for q in range(NQ4)
                ]
                sbits = [
                    ((jbyte >> (4 + q)) & 1) != 0 for q in range(NQ4)
                ]
                nany = (jbyte & 0x0F) != 0
                sany = (jbyte & 0xF0) != 0
                if stats:
                    # debug accounting (SUBCLUSTER granularity, as the
                    # pre-quarter kernel): live nearest sections in bits
                    # 10..19 of the counter stream, shadow in 20..29
                    # (stats renders are not parity renders)
                    @pl.when(nany)
                    def _():
                        cnt_ref[...] = cnt_ref[...] + (1 << 10)

                    @pl.when(sany)
                    def _():
                        cnt_ref[...] = cnt_ref[...] + (1 << 20)
                for q in range(NQ4):
                    grange = range(q * (GROUPS // NQ4),
                                   (q + 1) * (GROUPS // NQ4))
                    if kb_sph:
                        cond = nbits[q] & is_sph if kb_tri else nbits[q]

                        @pl.when(cond)
                        def _(sub_s=sub_s, grange=grange):
                            sphere_nearest(sub_s, grange)
                    if kb_tri:
                        cond = nbits[q] & ~is_sph if kb_sph else nbits[q]

                        @pl.when(cond)
                        def _(sub_t=sub_t, grange=grange):
                            tri_nearest(sub_t, grange)
                    if kb_sph:
                        cond = sbits[q] & is_sph if kb_tri else sbits[q]

                        @pl.when(cond)
                        def _(sub_s=sub_s, grange=grange):
                            sphere_shadow(sub_s, grange)
                    if kb_tri:
                        cond = sbits[q] & ~is_sph if kb_sph else sbits[q]

                        @pl.when(cond)
                        def _(sub_t=sub_t, grange=grange):
                            tri_shadow(sub_t, grange)
                return _2

            jax.lax.fori_loop(0, CHUNK, inner, None)

        return _

    # ---- super level (hierarchy only): one union box per chunk gates
    # the chunk's whole quarter-flag computation AND its scalar sync —
    # 8 chunk bits per sync. In super-dead regions this replaces 48
    # quarter slab tests + 1 sync PER CHUNK with 3 slab tests + 1/8
    # sync, cutting the sweep's dead floor ~16x (the 100k tier's floor
    # measured 10.2 of 31.3 ms/frame, scratch/fused_breakdown.py); in
    # fully-live regions it adds ~6% slab tests. BTF/SFOLD reads are up
    # to a superchunk stale, which only ever WIDENS the conservative
    # keep set (BTF monotonically tightens; SFOLD only resolves).
    def _sbox(cid):
        base = cid * 8
        return (
            super_ref[base + 0], super_ref[base + 1],
            super_ref[base + 2], super_ref[base + 3],
            super_ref[base + 4], super_ref[base + 5],
        )

    def super_flags(g):
        """Packed int32 chunk-live mask for superchunk ``g`` — one sync.
        Bit j set = chunk order_ref[g*8+j] has ANY pending work (nearest
        or shadow) behind its union box; chunk_flags recomputes the
        precise per-quarter bits for live chunks."""
        nearest_on = ph < B
        shadow_on = ph > 0
        alive = sget(ACON) > constants.CONTRIBUTION_EPS
        btf = sget(BTF)
        o3 = (sget(OX), sget(OY), sget(OZ))
        iv3 = (sget(NIVX), sget(NIVY), sget(NIVZ))
        h3 = (sget(HX), sget(HY), sget(HZ))
        hw_pos = sget(HW) > 0.0
        pend_dl = [
            hw_pos & (sget(SFOLD[li]) == 0.0) for li in range(n_dl)
        ]
        pend_pl = [
            hw_pos & (sget(SFOLD[n_dl + lj]) == 0.0) for lj in range(n_pl)
        ]
        dl_iv = [
            tuple(cinv(dl_ref[li * 6 + cc]) for cc in range(3))
            for li in range(n_dl)
        ]
        pl_iv = [
            (sget(d["ivx"]), sget(d["ivy"]), sget(d["ivz"]))
            for d in PL_BASE
        ]
        pl_tmax = [sget(d["tmax"]) for d in PL_BASE]
        bits = jnp.zeros((TR, LANES), jnp.int32)
        for j in range(SUPERCHUNK):
            cid = order_ref[g * SUPERCHUNK + j]
            box = _sbox(cid)
            ok, tn = slab(*box, o3, iv3)
            keep = ok & alive
            if prune:
                keep = keep & (tn <= btf * 1.001 + 1e-3)
            live = keep & nearest_on
            skeep = jnp.zeros((TR, LANES), jnp.bool_)
            for li in range(n_dl):
                ok, _tn = slab(*box, h3, dl_iv[li])
                skeep = skeep | (ok & pend_dl[li])
            for lj in range(n_pl):
                ok, _tn = slab(*box, h3, pl_iv[lj], tmax=pl_tmax[lj])
                skeep = skeep | (ok & pend_pl[lj])
            live = live | (skeep & shadow_on)
            bits = bits | jnp.where(live, _bit(j), 0)
        if debug_sweep == "dead":  # perf-lab knob: overhead floor
            bits = bits & 0
        elif debug_sweep == "all":  # perf-lab knob: body ceiling
            bits = jnp.broadcast_to(jnp.int32(0xFF), bits.shape)
        return _fold_mask(bits)

    def superchunk_body(g, _):
        sbits = super_flags(g)

        @pl.when(sbits != 0)
        def _run():
            def inner(j, _2):
                @pl.when(((sbits >> j) & 1) != 0)
                def _():
                    chunk_body(g * SUPERCHUNK + j, None)

                return _2

            jax.lax.fori_loop(0, SUPERCHUNK, inner, None)

        return _

    if hierarchy:
        nc = -(-K // CHUNK)
        jax.lax.fori_loop(0, -(-nc // SUPERCHUNK), superchunk_body, None)
    else:
        jax.lax.fori_loop(0, -(-K // CHUNK), chunk_body, None)

    # ------------------------------------------------------------------
    # Final epilogue: last bounce's lighting + sky + outputs
    # ------------------------------------------------------------------

    @pl.when(ph == B)
    def _finish():
        lighting_from_folds()
        pr, pg, pb = sget(APR), sget(APG), sget(APB)
        skyw = sget(ASKYW)
        dx, dy, dz = sget(DX), sget(DY), sget(DZ)
        cnt = cnt_ref[...]
        if procedural is not None:
            sky_eval = (
                _sky_color_procedural_bilinear if cfg.skybox_bilinear
                else _sky_color_procedural
            )
            skr, skg, skb = sky_eval(dx, dy, dz, sky_dim, procedural)
            pr = pr + skyw * skr
            pg = pg + skyw * skg
            pb = pb + skyw * skb
        elif cfg.skybox_bilinear:
            # deferred 4-tap image bilinear, as the demo kernel: the
            # floor-based low-corner tap rides the counter stream, the
            # fractional weights ride two extra f32 streams, and the
            # XLA epilogue derives the clamped neighbors and lerps
            idx00, wu, wv = _sky_texel_index_bilinear(dx, dy, dz, sky_dim)
            cnt = cnt | (idx00 << 10)
            out_wu[0] = wu
            out_wv[0] = wv
        else:
            cnt = cnt | (_sky_texel_index(dx, dy, dz, sky_dim) << 10)
        out_r[0] = pr
        out_g[0] = pg
        out_b[0] = pb
        out_total[0] = sget(ATOT)
        out_cnt[0] = cnt
        out_skyw[0] = skyw


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "kb_sph", "kb_tri", "n_dl", "n_pl", "sky_dim",
                     "interpret", "tile_rows", "procedural", "prune",
                     "n_rows", "n_samples", "swizzle", "stats",
                     "debug_sweep", "hierarchy"),
)
def _render_rays_fused(
    pack: ClusterPack,
    cam, dl, plt, order, aabb,
    skybox_flat: jnp.ndarray,
    cfg: RenderConfig,
    kb_sph: int,
    kb_tri: int,
    n_dl: int,
    n_pl: int,
    sky_dim: int,
    interpret: bool = False,
    tile_rows: int = TILE_ROWS,
    procedural: str = None,
    prune: bool = True,
    n_rows: int = None,
    n_samples: int = None,
    swizzle=None,
    stats: bool = False,
    debug_sweep: str = None,
    super_tab=None,
    hierarchy: bool = False,
):
    W, H, N = cfg.width, cfg.height, cfg.rays_per_pixel
    if n_rows is None:
        n_rows = H
    if n_samples is None:
        n_samples = N
    n_rays = W * n_rows * n_samples
    TR = tile_rows
    if swizzle is not None:
        TW_, TH_ = swizzle
        assert TW_ * TH_ * n_samples == TR * LANES, (swizzle, TR)
        tiles_x = -(-W // TW_)
        tiles_y = -(-n_rows // TH_)
        n_tiles = tiles_x * tiles_y
        # static unscramble: linear ray index -> swizzled lane position
        s = np.arange(n_tiles * TR * LANES)
        i_t, l = s // (TR * LANES), s % (TR * LANES)
        pp = TH_ * TW_
        k_, rem = l // pp, l % pp
        colv = (i_t % tiles_x) * TW_ + rem % TW_
        rowv = (i_t // tiles_x) * TH_ + rem // TW_
        valid = (colv < W) & (rowv < n_rows)
        lin = k_ * (n_rows * W) + rowv * W + colv
        lin2s = np.empty(n_rays, np.int32)
        lin2s[lin[valid]] = s[valid]
        unscramble = jnp.asarray(lin2s)
    else:
        n_tiles = pl.cdiv(n_rays, TR * LANES)
        unscramble = None
    B = cfg.bounce_limit
    n_lights = n_dl + n_pl

    # pad the visit order to a multiple of the sweep CHUNK (4) with the
    # extra NaN-box quarter rows: padded entries fail every slab test
    # and cost one flag computation each, never a body
    K = kb_sph + kb_tri
    k_pad = -(-K // 4) * 4
    if hierarchy:
        # order holds STATIC CHUNK ids. Pad to a multiple of the
        # superchunk width with the sentinel chunk id NC, whose super
        # box is NaN (never live); its quarter rows must still exist
        # because debug_sweep='all' forces the gates open — pad the
        # quarter table with the last-chunk's missing subclusters plus
        # one whole sentinel chunk, all NaN boxes.
        nc = k_pad // 4
        nsc_pad = -(-nc // SUPERCHUNK) * SUPERCHUNK
        if nsc_pad > nc:
            order = jnp.concatenate(
                [order, jnp.full((nsc_pad - nc,), nc, jnp.int32)]
            )
        super_tab = jnp.concatenate(
            [super_tab,
             jnp.full((1, super_tab.shape[1]), jnp.nan, jnp.float32)]
        ).reshape(-1)
        n_pad_subs = (k_pad - K) + 4
        aabb = jnp.concatenate(
            [aabb, jnp.full((n_pad_subs * 4, aabb.shape[1]), jnp.nan,
                            jnp.float32)]
        )
    else:
        if k_pad > K:
            order = jnp.concatenate(
                [order, jnp.full((k_pad - K,), K, jnp.int32)]
            )
        aabb = jnp.concatenate(
            [aabb, jnp.full((4, aabb.shape[1]), jnp.nan, jnp.float32)]
        )
    # FLAT 1-D SMEM layout: a 2-D (rows, 8) SMEM window pads its minor
    # dim to 128 lanes (512 B/row — measured: the 100k tier's
    # f32[3172,8] table allocated 1.55 MB against SMEM's 1 MB capacity
    # and failed remote compile, BENCH_r04). Flat packing is 4 B/elem:
    # the same table is 102 KB, good to ~1M spheres.
    aabb = aabb.reshape(-1)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    geom_in = []
    geom_specs = []
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

    bil_img = cfg.skybox_bilinear and procedural is None

    def kernel(*refs):
        cam_r, dl_r, pl_r, order_r, aabb_r = refs[:5]
        n = 5
        sup_r = refs[n] if hierarchy else None
        n += 1 if hierarchy else 0
        sph_r = refs[n] if kb_sph else None
        n += 1 if kb_sph else 0
        tri_r = refs[n] if kb_tri else None
        n += 1 if kb_tri else 0
        outs = refs[n:n + 6]
        n += 6
        wuv = refs[n:n + 2] if bil_img else (None, None)
        n += 2 if bil_img else 0
        scratch = refs[n:]
        _fused_kernel(
            cam_r, dl_r, pl_r, order_r, aabb_r, sph_r, tri_r,
            *outs, *scratch, out_wu=wuv[0], out_wv=wuv[1],
            super_ref=sup_r, hierarchy=hierarchy,
            cfg=cfg, kb_sph=kb_sph, kb_tri=kb_tri, n_dl=n_dl, n_pl=n_pl,
            sky_dim=sky_dim, tile_rows=tile_rows, procedural=procedural,
            prune=prune, n_rows=n_rows, n_samples=n_samples,
            swizzle=swizzle, stats=stats, debug_sweep=debug_sweep,
        )

    tile_out = lambda dt: (
        jax.ShapeDtypeStruct((n_tiles, TR, LANES), dt),
        pl.BlockSpec((1, TR, LANES), lambda i, p: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    shapes_specs = [
        tile_out(jnp.float32),  # pix r
        tile_out(jnp.float32),  # pix g
        tile_out(jnp.float32),  # pix b
        tile_out(jnp.float32),  # total
        tile_out(jnp.int32),  # counters (| sky texel index when textured)
        tile_out(jnp.float32),  # sky_w
    ]
    if bil_img:
        shapes_specs += [
            tile_out(jnp.float32),  # wu (bilinear u fraction)
            tile_out(jnp.float32),  # wv (bilinear v fraction)
        ]
    # state slot count: must equal the kernel's slot map (kernel asserts)
    # 17 base + n_dl (SDL_OD) + 9*n_pl (PL_BASE) + 7 (hit attrs + hw)
    # + 6 (accumulators) + 1 (BTF) + n_lights (SFOLD)
    # + 4 when specular (MSPEC + view xyz)
    ns = 31 + 2 * n_dl + 10 * n_pl + (4 if cfg.specular else 0)
    nq = 9 + n_lights + (1 if cfg.specular else 0)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, B + 1),
        out_shape=[s for s, _ in shapes_specs],
        in_specs=[smem() for _ in range(6 if hierarchy else 5)]
        + geom_specs,
        out_specs=[sp for _, sp in shapes_specs],
        scratch_shapes=[
            pltpu.VMEM((ns * TR, LANES), jnp.float32),
            pltpu.VMEM((nq * TR * 8, LANES), jnp.float32),
            pltpu.VMEM((TR, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(cam, dl, plt, order, aabb,
      *((super_tab,) if hierarchy else ()), *geom_in)

    if bil_img:
        pr, pg, pb, total, counts, sky_w, wu_t, wv_t = outs
    else:
        pr, pg, pb, total, counts, sky_w = outs

    def flat(a):
        return a.reshape(-1)

    # epilogue on the PADDED aligned shape; the final gather is either a
    # contiguous end-slice (linear order) or the static swizzle
    # unscramble permutation (render_pallas epilogue notes apply)
    def unpad(a):
        return a[:n_rays] if unscramble is None else a[unscramble]

    if procedural is None:
        idx = flat(counts) >> 10
        c255 = jnp.asarray(255.0, jnp.float32)
        if bil_img:
            # deferred 4-tap bilinear — the shared epilogue helper (the
            # lerp order is a bit-exactness contract with sample_skybox)
            from ttrt.render.skybox import bilinear_from_low_tap

            skr, skg, skb = bilinear_from_low_tap(
                skybox_flat, idx, flat(wu_t), flat(wv_t), sky_dim
            )
        else:
            texel = fetch_packed_texels(skybox_flat, idx)
            skr = ((texel >> 16) & 0xFF).astype(jnp.float32) / c255
            skg = ((texel >> 8) & 0xFF).astype(jnp.float32) / c255
            skb = (texel & 0xFF).astype(jnp.float32) / c255
        w = flat(sky_w)
        if cfg.energy_model == "subtract":
            inv_total = 1.0  # subtract-model weights partition unity
        else:
            total_f = flat(total)
            inv_total = 1.0 / jnp.where(total_f > 0.0, total_f, 1.0)
        color = Vec3(
            unpad((flat(pr) + w * skr) * inv_total),
            unpad((flat(pg) + w * skg) * inv_total),
            unpad((flat(pb) + w * skb) * inv_total),
        )
    else:
        if cfg.energy_model == "subtract":
            inv_total = 1.0  # subtract-model weights partition unity
        else:
            total_f = flat(total)
            inv_total = 1.0 / jnp.where(total_f > 0.0, total_f, 1.0)
        color = Vec3(
            unpad(flat(pr) * inv_total),
            unpad(flat(pg) * inv_total),
            unpad(flat(pb) * inv_total),
        )

    if stats:
        # debug mode: hand back the raw per-lane counter stream (live
        # nearest sections ride bits 10..19, live shadow sections bits
        # 20..29 — identical on every lane of a tile)
        return color, counts
    st = flat(counts)
    bounces = (st & 0x1F).astype(jnp.uint32)
    hits = ((st >> 5) & 0x1F).astype(jnp.uint32)
    rays = (bounces + hits * jnp.uint32(n_lights)).sum(dtype=jnp.uint32)
    return color, rays


def render_band_mesh_fused(
    scene, cfg: RenderConfig, row_offset=0.0, n_rows: int = None, *,
    sample_offset=0.0, n_samples: int = None,
    interpret: bool = False, tile_rows: int = TILE_ROWS,
    prune: bool = True, reduce: str = "avg", swizzle="auto",
    stats: bool = False, debug_sweep: str = None, hierarchy: bool = None,
) -> Tuple[Vec3, jnp.ndarray]:
    """Render a horizontal band x AA-sample slice of a MeshScene frame
    through the fused kernel (offsets may be traced — shard_map callers
    pass lax.axis_index-derived offsets, as with
    render_pallas.render_band_pallas). Returns the (n_rows, W)
    framebuffer Vec3 + trace count; ``reduce='sum'`` leaves the
    per-pixel sample SUM for a cross-chip psum. ``hierarchy`` forces the
    two-level sweep on/off; None auto-enables it at
    HIERARCHY_MIN_SUBCLUSTERS (large scenes, where the flat sweep's
    bookkeeping floor dominates — see _super_table)."""
    if cfg.dtype != jnp.float32:
        raise ConfigError("fused mesh path is float32-only")
    if cfg.bounce_limit > 16:
        raise ConfigError("fused mesh path supports bounce_limit <= 16")
    if scene.clusters is None:
        raise ConfigError("scene has no cluster pack (clusters=None)")
    if (
        scene.skybox.procedural is None
        and 6 * scene.skybox.dim * scene.skybox.dim > (2**31 - 1) >> 10
    ):
        raise ConfigError(
            "fused mesh textured path supports cubemap dim <= 591"
        )
    W, N = cfg.width, cfg.rays_per_pixel
    if n_rows is None:
        n_rows = cfg.height
    if n_samples is None:
        n_samples = N
    if swizzle == "auto":
        # square-ish (TH, TW) pixel tiles covering all AA samples; fall
        # back to linear lane order when the shapes don't divide
        lanes_per_tile = tile_rows * LANES
        pp = lanes_per_tile // n_samples
        tw = 32 if pp % 32 == 0 else (16 if pp % 16 == 0 else 0)
        swizzle = (tw, pp // tw) if (
            tw and lanes_per_tile % n_samples == 0
        ) else None
    if stats:
        swizzle = None  # stats probes read raw per-tile counters
    pack = scene.clusters
    cam = pack_camera(scene.camera, jnp.float32, row_offset, sample_offset)
    dl = pack_dlights(scene.directional_lights, jnp.float32)
    plt = pack_plights(scene.point_lights, jnp.float32)
    origin = scene.camera.frame.origin.astype(jnp.float32)
    if hierarchy is None:
        hierarchy = (
            pack.kb_sph + pack.kb_tri >= HIERARCHY_MIN_SUBCLUSTERS
        )
    aabb = _aabb_table(pack)
    if hierarchy:
        super_tab = _super_table(pack)
        order = order_chunks(super_tab, origin)
    else:
        super_tab = None
        order = order_subclusters(pack, origin)
    color, rays = _render_rays_fused(
        pack, cam, dl, plt, order, aabb,
        scene.skybox.packed.reshape(-1),
        cfg, pack.kb_sph, pack.kb_tri,
        scene.directional_lights.count, scene.point_lights.count,
        scene.skybox.dim, interpret, tile_rows,
        scene.skybox.procedural, prune, n_rows, n_samples, swizzle, stats,
        debug_sweep, super_tab, hierarchy,
    )
    scale = 1.0 / N if reduce == "avg" else 1.0

    def red(c):
        return c.reshape(n_samples, n_rows, W).sum(axis=0) * scale

    return Vec3(red(color.x), red(color.y), red(color.z)), rays


def render_frame_mesh_fused(
    scene, cfg: RenderConfig, *, interpret: bool = False,
    tile_rows: int = TILE_ROWS, prune: bool = True, swizzle="auto",
    stats: bool = False, debug_sweep: str = None, hierarchy: bool = None,
) -> Tuple[Vec3, jnp.ndarray]:
    """Whole-frame fused render of a MeshScene: returns the (H, W)
    framebuffer Vec3 + trace count. Drop-in for
    ttrt.render.integrator.render_frame on many-object scenes carrying a
    cluster pack. ``debug_sweep`` ('dead'/'all') is the perf-lab knob
    behind scratch/fused_breakdown.py's overhead-floor / body-ceiling
    roofline measurements (BASELINE.md 10k amendment) — not a render
    mode."""
    fb, rays = render_band_mesh_fused(
        scene, cfg, 0.0, cfg.height, interpret=interpret,
        tile_rows=tile_rows, prune=prune, swizzle=swizzle, stats=stats,
        debug_sweep=debug_sweep, hierarchy=hierarchy,
    )
    return fb, rays
