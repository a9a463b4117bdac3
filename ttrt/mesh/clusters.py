"""Spatially-clustered geometry packing for the TPU many-object kernel.

The dense exhaustive tester (ttrt.mesh.dense) is VPU-roofline-bound: every
ray pays ~20 arithmetic ops per scene object, so 10k spheres cap out around
10-25 Mray/s no matter how well the pair math schedules. The only lever
left is CULLING — doing less work — and the TPU-native way to cull without
divergent control flow is COARSE lockstep culling:

  * spheres are sorted by a Morton (z-order) key and chunked into
    contiguous CLUSTERS of 128 (= one VPU lane tile), each with a
    precomputed AABB;
  * the Pallas narrow kernel (ttrt.kernels.mesh_pallas) performs the
    PRODUCTION culling IN-KERNEL: a branch-free conservative slab test of
    the whole ray tile against each subcluster AABB, then one pl.when
    skip of the ~8k-instruction narrow body — measured far cheaper than
    staging an XLA-computed live matrix through scalar prefetch;
  * ``live_clusters`` below is the TEST ORACLE only: a reference XLA
    broad phase whose conservative live matrix must cover every winner
    the kernel reports (tests/test_clusters.py).

The reference's roadmap item this serves is the acceleration-structure
line (TerminalRayTracer.c:30, README.md:20); the uniform grid
(ttrt.mesh.grid) remains the CPU-path structure, while this is its
TPU-native replacement: regular, branch-free, lockstep-friendly.

Cluster packing happens ONCE at scene build on the host (NumPy): the sort
order, padding, and AABBs are static data, exactly like the grid build.
Scenes whose geometry moves (MeshScene.with_spheres) drop the pack the
same way they drop the grid.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ttrt.mesh.triangles import Triangles
from ttrt.scene import Spheres
from ttrt.vec import Vec3

BLOCK = 128  # spheres/triangles per cluster (culling granularity)
GROUPS = BLOCK // 8  # 8-sublane pair groups per cluster
QUARTERS = 4  # fine-culling granularity inside a cluster (32 objects,
QBLOCK = BLOCK // QUARTERS  # = 4 consecutive Morton groups each)
PAGE = 1024  # objects per kernel DMA page (= 128 table columns); Mosaic
SUBS = PAGE // BLOCK  # clusters per page           # needs lane-aligned loads
TILE_RAYS = 1024  # rays per kernel tile: (8, 128)

# padding sphere: center 0 / ccr2 huge => disc = b^2 - 4*a*(oo + 1e30) < 0
# for every real ray, so pad slots can never win (no mask op needed).
_PAD_CCR2 = 1.0e30


class ClusterPack(NamedTuple):
    """Device-resident packed geometry (all float32).

    ``sph``: (10, KB, 8, 16) where [c, k, s, g] is component c of sphere
    ``k*128 + g*8 + s`` in Morton order — component rows are cx cy cz
    ccr2 id cr cg cb refl spec with ccr2 = |C|^2 - r^2 precomputed (the
    narrow kernel's quadratic ``c`` term needs only ccr2, not the
    radius) and id the ORIGINAL sphere index as f32 (-1 on padding).
    Rows 5..9 are the MATERIAL (color rgb + reflectivity +
    Blinn-Phong specularity, TerminalRayTracer.c:913-916), consumed by
    the fused whole-frame kernel (ttrt.kernels.mesh_fused) which shades
    in-kernel and so never gathers by id; the nearest-hit kernel
    (ttrt.kernels.mesh_pallas) reads only rows 0..4. The trailing
    (8, 16) page puts 8 consecutive spheres on sublanes so the kernel
    reads a (8, 1) column and broadcasts it against a (1, 128) ray row —
    the pair block is a native (8, 128) vreg with zero transposes —
    while the subcluster axis k is a BlockSpec grid index (Mosaic wants
    block minor dims equal to the array's, so the 16-group page IS the
    minor dim).
    ``tri``: (18, KB, 8, 16) rows v0xyz e1xyz e2xyz id nx ny nz cr cg
    cb refl spec, same layout (rows 10..17 again fused-kernel-only).
    ``sph_lo/hi``: (KB_s, 3) radius-inflated cluster AABBs.
    ``tri_lo/hi``: (KB_t, 3) cluster AABBs over all three vertices.
    ``sph_lo_q/hi_q``: (KB_s, 4, 3) per-QUARTER AABBs (32 consecutive
    Morton objects = groups 4q..4q+3 of the table); NaN where the
    quarter is all padding, so every slab comparison fails. The fused
    kernel's fine culling granularity (ttrt.kernels.mesh_fused).
    ``tri_lo_q/hi_q``: same for triangle clusters.
    """

    sph: jnp.ndarray
    sph_lo: jnp.ndarray
    sph_hi: jnp.ndarray
    sph_valid: jnp.ndarray  # (KB_s,) 1 where the cluster has real members
    tri: jnp.ndarray
    tri_lo: jnp.ndarray
    tri_hi: jnp.ndarray
    tri_valid: jnp.ndarray
    sph_lo_q: jnp.ndarray
    sph_hi_q: jnp.ndarray
    tri_lo_q: jnp.ndarray
    tri_hi_q: jnp.ndarray

    @property
    def kb_sph(self) -> int:
        return self.sph_lo.shape[0]

    @property
    def kb_tri(self) -> int:
        return self.tri_lo.shape[0]


def _morton_order(points: np.ndarray) -> np.ndarray:
    """Sort order by 30-bit 3D Morton code (10 bits/axis). Consecutive
    chunks of the order are spatially compact, which is all the cluster
    AABBs need."""
    lo = points.min(axis=0)
    span = np.maximum(points.max(axis=0) - lo, 1e-9)
    q = np.clip(((points - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    key = (spread(q[:, 0]) << np.uint64(2)) | (
        spread(q[:, 1]) << np.uint64(1)
    ) | spread(q[:, 2])
    return np.argsort(key, kind="stable")


def _pad_cols(a: np.ndarray, fill: float) -> np.ndarray:
    pad = (-a.shape[0]) % PAGE  # page-aligned so kernel DMA blocks are full
    if pad:
        a = np.concatenate([a, np.full((pad,), fill, a.dtype)])
    return a


def pack_clusters(
    spheres: Optional[Spheres],
    triangles: Optional[Triangles],
    *,
    np_spheres=None,  # (centers, radii) or (centers, radii, colors,
    #                   refl, spec) host arrays — materials all-or-none
    np_tris=None,  # Triangles.create_np dict (incl. 'specularity')
) -> ClusterPack:
    """Host-side pack: Morton-sort, chunk into 128-wide clusters, compute
    AABBs, lay out the (C, KB, 8, 16) tables. Pass the geometry as host
    arrays when available — fetching the device leaves back costs up to
    ~90 s per buffer on tunnel backends. ``np_spheres`` may carry the
    material as entries 3..5, ALL of (colors, refl, spec) or none — a
    partial material would silently fall back to device fetches for the
    rest (the regression class round 2 fixed), so it raises instead;
    with geometry-only tuples the material leaves are fetched."""
    f32 = np.float32

    def table(rows):  # list of (n_pad,) -> (C, n_pad//128, 8, 16)
        return jnp.asarray(
            np.stack(
                [
                    r.reshape(-1, GROUPS, 8).transpose(0, 2, 1)
                    for r in rows
                ],
                axis=0,
            ),
            jnp.float32,
        )

    if spheres is not None and spheres.count:
        if np_spheres is not None and len(np_spheres) >= 4:
            c = np.asarray(np_spheres[0], f32)
            r = np.asarray(np_spheres[1], f32)
            col3 = np.asarray(np_spheres[2], f32)
            refl = np.asarray(np_spheres[3], f32)
            if len(np_spheres) < 5:
                # falling back to the device leaf here would be a
                # SYNCHRONOUS device->host fetch mid-build — the exact
                # regression the np fast path exists to avoid (~90 s
                # first fetch on tunnel backends). Require the host
                # array instead.
                raise ValueError(
                    "np_spheres fast path requires spec: pass "
                    "(centers, radii, colors, refl, spec)"
                )
            spec = np.asarray(np_spheres[4], f32)
        else:
            if np_spheres is not None:
                c = np.asarray(np_spheres[0], f32)
                r = np.asarray(np_spheres[1], f32)
            else:
                c = np.stack(
                    [np.asarray(v, np.float64) for v in spheres.center],
                    axis=-1,
                ).astype(f32)
                r = np.asarray(spheres.radius, f32)
            mat = spheres.material
            col3 = np.stack(
                [np.asarray(v, np.float64) for v in mat.color], axis=-1
            ).astype(f32)
            refl = np.asarray(mat.reflectivity, f32)
            spec = np.asarray(mat.specularity, f32)
        order = _morton_order(c)
        c, r = c[order], r[order]
        col3, refl, spec = col3[order], refl[order], spec[order]
        ccr2 = (c[:, 0] ** 2 + c[:, 1] ** 2 + c[:, 2] ** 2 - r * r).astype(
            f32
        )
        ids = order.astype(f32)
        lo_pts = c - r[:, None]
        hi_pts = c + r[:, None]
        cols = [
            _pad_cols(c[:, 0], 0.0), _pad_cols(c[:, 1], 0.0),
            _pad_cols(c[:, 2], 0.0), _pad_cols(ccr2, _PAD_CCR2),
            _pad_cols(ids, -1.0),
            _pad_cols(col3[:, 0], 0.0), _pad_cols(col3[:, 1], 0.0),
            _pad_cols(col3[:, 2], 0.0), _pad_cols(refl, 0.0),
            _pad_cols(spec, 0.0),
        ]
        sph = table(cols)
        kb = cols[0].shape[0] // BLOCK
        # per-cluster AABB over the REAL members only (padding is inert);
        # fully-padded clusters get an empty box + valid=0 (the broad
        # phase masks them out — an inverted inf box would otherwise pass
        # the slab test).
        lo = np.full((kb, 3), np.inf, f32)
        hi = np.full((kb, 3), -np.inf, f32)
        valid = np.zeros((kb,), np.int32)
        lo_q = np.full((kb, QUARTERS, 3), np.nan, f32)
        hi_q = np.full((kb, QUARTERS, 3), np.nan, f32)
        for k in range(kb):
            end = min((k + 1) * BLOCK, c.shape[0])
            if end > k * BLOCK:
                sl = slice(k * BLOCK, end)
                lo[k] = lo_pts[sl].min(axis=0)
                hi[k] = hi_pts[sl].max(axis=0)
                valid[k] = 1
            for q in range(QUARTERS):
                qs = k * BLOCK + q * QBLOCK
                qe = min(qs + QBLOCK, c.shape[0])
                if qe > qs:
                    lo_q[k, q] = lo_pts[qs:qe].min(axis=0)
                    hi_q[k, q] = hi_pts[qs:qe].max(axis=0)
        sph_lo, sph_hi = jnp.asarray(lo), jnp.asarray(hi)
        sph_valid = jnp.asarray(valid)
        sph_lo_q, sph_hi_q = jnp.asarray(lo_q), jnp.asarray(hi_q)
    else:
        sph = jnp.zeros((10, 0, 8, GROUPS), jnp.float32)
        sph_lo = jnp.zeros((0, 3), jnp.float32)
        sph_hi = jnp.zeros((0, 3), jnp.float32)
        sph_valid = jnp.zeros((0,), jnp.int32)
        sph_lo_q = jnp.zeros((0, QUARTERS, 3), jnp.float32)
        sph_hi_q = jnp.zeros((0, QUARTERS, 3), jnp.float32)

    n_spheres = spheres.count if spheres is not None else 0
    if triangles is not None and triangles.count:
        if np_tris is not None:
            v0 = np.asarray(np_tris["v0"], f32)
            e1 = np.asarray(np_tris["e1"], f32)
            e2 = np.asarray(np_tris["e2"], f32)
            nrm = np.asarray(np_tris["normal"], f32)
            tcol = np.asarray(np_tris["color"], f32)
            trefl = np.asarray(np_tris["reflectivity"], f32)
            if "specularity" not in np_tris:
                # same no-device-fetch rule as np_spheres above
                # (Triangles.create_np always includes the key)
                raise ValueError(
                    "np_tris fast path requires a 'specularity' entry"
                )
            tspec = np.asarray(np_tris["specularity"], f32)
        else:
            v0 = np.stack(
                [np.asarray(v, np.float64) for v in triangles.v0], -1
            ).astype(f32)
            e1 = np.stack(
                [np.asarray(v, np.float64) for v in triangles.e1], -1
            ).astype(f32)
            e2 = np.stack(
                [np.asarray(v, np.float64) for v in triangles.e2], -1
            ).astype(f32)
            nrm = np.stack(
                [np.asarray(v, np.float64) for v in triangles.normal], -1
            ).astype(f32)
            tcol = np.stack(
                [np.asarray(v, np.float64)
                 for v in triangles.material.color], -1
            ).astype(f32)
            trefl = np.asarray(triangles.material.reflectivity, f32)
            tspec = np.asarray(triangles.material.specularity, f32)
        centroid = v0 + (e1 + e2) / 3.0
        order = _morton_order(centroid)
        v0, e1, e2 = v0[order], e1[order], e2[order]
        nrm, tcol, trefl = nrm[order], tcol[order], trefl[order]
        tspec = tspec[order]
        # GridHit id convention: triangles follow spheres in one id space
        ids = (order + n_spheres).astype(f32)
        cols = [
            _pad_cols(v0[:, i], 0.0) for i in range(3)
        ] + [
            _pad_cols(e1[:, i], 0.0) for i in range(3)
        ] + [
            _pad_cols(e2[:, i], 0.0) for i in range(3)
        ] + [_pad_cols(ids, -1.0)] + [
            _pad_cols(nrm[:, i], 0.0) for i in range(3)
        ] + [
            _pad_cols(tcol[:, i], 0.0) for i in range(3)
        ] + [_pad_cols(trefl, 0.0), _pad_cols(tspec, 0.0)]
        tri = table(cols)
        kb = cols[0].shape[0] // BLOCK
        pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (m, 3 verts, 3)
        lo = np.full((kb, 3), np.inf, f32)
        hi = np.full((kb, 3), -np.inf, f32)
        valid = np.zeros((kb,), np.int32)
        lo_q = np.full((kb, QUARTERS, 3), np.nan, f32)
        hi_q = np.full((kb, QUARTERS, 3), np.nan, f32)
        for k in range(kb):
            end = min((k + 1) * BLOCK, v0.shape[0])
            if end > k * BLOCK:
                sl = slice(k * BLOCK, end)
                lo[k] = pts[sl].min(axis=(0, 1))
                hi[k] = pts[sl].max(axis=(0, 1))
                valid[k] = 1
            for q in range(QUARTERS):
                qs = k * BLOCK + q * QBLOCK
                qe = min(qs + QBLOCK, v0.shape[0])
                if qe > qs:
                    lo_q[k, q] = pts[qs:qe].min(axis=(0, 1))
                    hi_q[k, q] = pts[qs:qe].max(axis=(0, 1))
        tri_lo, tri_hi = jnp.asarray(lo), jnp.asarray(hi)
        tri_valid = jnp.asarray(valid)
        tri_lo_q, tri_hi_q = jnp.asarray(lo_q), jnp.asarray(hi_q)
    else:
        tri = jnp.zeros((18, 0, 8, GROUPS), jnp.float32)
        tri_lo = jnp.zeros((0, 3), jnp.float32)
        tri_hi = jnp.zeros((0, 3), jnp.float32)
        tri_valid = jnp.zeros((0,), jnp.int32)
        tri_lo_q = jnp.zeros((0, QUARTERS, 3), jnp.float32)
        tri_hi_q = jnp.zeros((0, QUARTERS, 3), jnp.float32)

    return ClusterPack(sph, sph_lo, sph_hi, sph_valid,
                       tri, tri_lo, tri_hi, tri_valid,
                       sph_lo_q, sph_hi_q, tri_lo_q, tri_hi_q)


def live_clusters(
    pack: ClusterPack, o: Vec3, d: Vec3, n_tiles: int
) -> jnp.ndarray:
    """REFERENCE broad phase (tests only): (T, 8, KB_s + KB_t) int32 — 1
    when ANY ray of ROW r (128 rays) of tile t may hit cluster k's AABB
    (robust slab test; an axis with |d| ~ 0 passes iff the origin lies
    inside that slab, so no false negatives from inf*0 NaNs).

    The production kernel (ttrt.kernels.mesh_pallas) performs its own
    IN-KERNEL slab test per (tile, subcluster) — measured far cheaper
    than staging an XLA-computed live matrix through scalar prefetch —
    using a slightly MORE permissive clamped-1/d form. Both are
    conservative w.r.t. true intersections, so the test-suite invariant
    "every kernel winner's cluster passes this reference test" holds.
    ``o``/``d`` components are the PADDED (T*1024,) flat arrays."""
    lo = jnp.concatenate([pack.sph_lo, pack.tri_lo], axis=0)  # (K, 3)
    hi = jnp.concatenate([pack.sph_hi, pack.tri_hi], axis=0)
    eps = jnp.float32(1e-6)

    # (K, R) orientation: the ray axis is the minor dim, so every
    # elementwise op is lane-native and the per-row ANY is a native
    # lane-dimension reduction (a (R, K) layout with K=88 minor forced
    # padded vregs and a middle-axis reduce — measured ~2.4 ms/trace).
    R = o.x.shape[0]
    tmin = jnp.full((lo.shape[0], R), -jnp.inf, jnp.float32)
    tmax = jnp.full((lo.shape[0], R), jnp.inf, jnp.float32)
    for ax, (oc, dc) in enumerate(((o.x, d.x), (o.y, d.y), (o.z, d.z))):
        oc = oc[None, :]  # (1, R)
        dc = dc[None, :]
        par = jnp.abs(dc) <= eps
        inv = 1.0 / jnp.where(par, 1.0, dc)
        lo_ax = lo[:, ax : ax + 1] - eps  # (K, 1)
        hi_ax = hi[:, ax : ax + 1] + eps
        t1 = (lo_ax - oc) * inv
        t2 = (hi_ax - oc) * inv
        near = jnp.minimum(t1, t2)
        far = jnp.maximum(t1, t2)
        inside = (oc >= lo_ax) & (oc <= hi_ax)
        near = jnp.where(par, jnp.where(inside, -jnp.inf, jnp.inf), near)
        far = jnp.where(par, jnp.where(inside, jnp.inf, -jnp.inf), far)
        tmin = jnp.maximum(tmin, near)
        tmax = jnp.minimum(tmax, far)

    hit = tmax >= jnp.maximum(tmin, 0.0)  # (K, R)
    live = jnp.any(
        hit.reshape(-1, n_tiles, 8, TILE_RAYS // 8), axis=3
    )  # (K, T, 8)
    valid = jnp.concatenate([pack.sph_valid, pack.tri_valid]) != 0
    return (
        jnp.transpose(live, (1, 2, 0)) & valid[None, None, :]
    ).astype(jnp.int32)
