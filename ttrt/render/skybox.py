"""Cubemap skybox sampling — the texture gather of the render kernel.

Reference: get_skybox_color (TerminalRayTracer.c:697-789). Steps:
  1. face = argmax over the 6 cube axes of dot(dir, axis) — strict-greater
     scan in face order, so ties resolve to the FIRST max (argmax matches).
  2. scale dir so its face-axis component is 1 (point on the unit cube),
     take the orthogonal component * 0.5 (faces sit 0.5 from the origin).
  3. (u, v) = orthogonal component dotted with the axes (face+2)%6 and
     (face+4)%6 (TerminalRayTracer.c:726-727).
  4. per-face empirical uv fixups "based on the milkyway skybox"
     (TerminalRayTracer.c:729-761): odd faces mirror u; faces 0/1 rotate
     -90deg; 2/3 rotate +90deg; 4 rotates 180deg.
  5. clamp uv to (-0.5, 0.5), nearest texel via int truncation
     (TerminalRayTracer.c:778-788).

TPU-first design: steps 3-4 are compositions of sign flips and swaps, so
they fold EXACTLY (no FP error — all coefficients are 0/±1) into two
precomputed (6, 3) lookup tables U_AXIS/V_AXIS, turning the reference's
per-face branch ladder into two tiny gathers + dot products, uniform across
all lanes. The texel fetch is one flat gather per channel from the
(6*dim*dim,) face array — XLA lowers this to a TPU dynamic-gather.

The reference indexes texture[u + v*dim] where rows are PPM scanlines, i.e.
u is the column and v the row — faces stored (6, dim<v>, dim<u>).

Note on the reference's out-of-bounds edge: clamp yields u,v in the CLOSED
interval [-0.5, 0.5]; u == 0.5 exactly maps to index dim (an OOB read / UB
in the C). We clamp indices to dim-1: defined behavior, identical for every
in-range texel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ttrt.scene import Skybox
from ttrt.vec import Vec3

# Cube axes in face order +X,-X,+Y,-Y,+Z,-Z (CUBEMAP_AXES,
# TerminalRayTracer.c:137-143).
CUBEMAP_AXES = np.array(
    [
        [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
    ]
)


def _build_uv_tables():
    """Fold the (face+2)%6 / (face+4)%6 axis picks and the per-face fixups
    (TerminalRayTracer.c:726-761) into (6,3) U/V axis tables."""
    u_axis = np.zeros((6, 3))
    v_axis = np.zeros((6, 3))
    for f in range(6):
        a2 = CUBEMAP_AXES[(f + 2) % 6]
        a4 = CUBEMAP_AXES[(f + 4) % 6]
        mir = np.diag([-1.0, 1.0]) if f % 2 == 1 else np.eye(2)
        if f in (0, 1):  # rotate -90: (u,v) -> (v,-u)
            rot = np.array([[0.0, 1.0], [-1.0, 0.0]])
        elif f in (2, 3):  # rotate +90: (u,v) -> (-v,u)
            rot = np.array([[0.0, -1.0], [1.0, 0.0]])
        elif f == 4:  # rotate 180
            rot = -np.eye(2)
        else:
            rot = np.eye(2)
        t = rot @ mir
        u_axis[f] = t[0, 0] * a2 + t[0, 1] * a4
        v_axis[f] = t[1, 0] * a2 + t[1, 1] * a4
    return u_axis, v_axis


U_AXIS, V_AXIS = _build_uv_tables()


def skybox_uv(d: Vec3):
    """Direction batch -> (face, u, v) with u,v clamped to [-0.5, 0.5].

    Split out from the texel fetch so unit tests can check face selection
    and uv math against the C transcription face-by-face.
    """
    dtype = d.x.dtype
    dirn = d.normalize()  # guarded normalize (TerminalRayTracer.c:702)

    axes = jnp.asarray(CUBEMAP_AXES, dtype)
    # dot(dir, axis_f) for all 6 faces, stacked on a new leading axis: (6, ...)
    dots = jnp.stack(
        [
            axes[f, 0] * dirn.x + axes[f, 1] * dirn.y + axes[f, 2] * dirn.z
            for f in range(6)
        ]
    )
    face = jnp.argmax(dots, axis=0).astype(jnp.int32)
    best_t = jnp.max(dots, axis=0)

    # dir scaled so its face-axis component == 1 (TerminalRayTracer.c:717-719)
    inv = 1.0 / best_t
    sx, sy, sz = dirn.x * inv, dirn.y * inv, dirn.z * inv

    ax = Vec3(
        jnp.take(axes[:, 0], face),
        jnp.take(axes[:, 1], face),
        jnp.take(axes[:, 2], face),
    )
    # C recomputes t = dot(scaled_dir, axis) rather than assuming 1.0
    # (TerminalRayTracer.c:720); keep that for parity.
    t2 = sx * ax.x + sy * ax.y + sz * ax.z
    ox = (sx - t2 * ax.x) * 0.5
    oy = (sy - t2 * ax.y) * 0.5
    oz = (sz - t2 * ax.z) * 0.5

    uax = jnp.asarray(U_AXIS, dtype)
    vax = jnp.asarray(V_AXIS, dtype)
    u = (
        ox * jnp.take(uax[:, 0], face)
        + oy * jnp.take(uax[:, 1], face)
        + oz * jnp.take(uax[:, 2], face)
    )
    v = (
        ox * jnp.take(vax[:, 0], face)
        + oy * jnp.take(vax[:, 1], face)
        + oz * jnp.take(vax[:, 2], face)
    )
    u = jnp.clip(u, -0.5, 0.5)
    v = jnp.clip(v, -0.5, 0.5)
    return face, u, v


def fetch_packed_texels(flat_table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Texel fetch reformulated for the TPU: XLA lowers a per-element
    jnp.take to ~7 ns/element (9+ ms for one reference frame's rays).
    Instead gather short texel ROWS (the embedding-style pattern) and pick
    the lane with a one-hot masked reduce — bit-identical, and the row
    gather costs ~2 cycles/row REGARDLESS of row width (measured: 128-wide
    2.96 ms, 16-wide 2.62 ms, plain take 9.0 ms for 1.34M fetches), so a
    16-texel row minimizes both the one-hot VPU work (16 lanes vs 128) and
    the gathered intermediate (64 B/ray vs 512 B). Falls back to plain
    take when the table size is not row-divisible (tiny test cubemaps)."""
    n = flat_table.shape[0]
    w = 16
    if n % w or idx.ndim != 1:
        return jnp.take(flat_table, idx)
    rows = jnp.take(flat_table.reshape(n // w, w), idx >> 4, axis=0)
    lane = (idx & (w - 1)).astype(jnp.int32)
    onehot = lane[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.sum(
        jnp.where(onehot, rows, jnp.zeros((), flat_table.dtype)),
        axis=1,
        dtype=flat_table.dtype,
    )


def _unpack(texels: jnp.ndarray, dtype) -> Vec3:
    """0x00RRGGBB uint32 -> float [0,1] channels in the compute dtype.
    A true division by 255 (NOT multiplication by a reciprocal): the
    reference computes texel/255.0 (TerminalRayTracer.c:866) and the two
    differ in the last ulp for some texel values, which is enough to flip
    uint8 quantization at truncation boundaries."""
    c255 = jnp.asarray(255.0, dtype)
    return Vec3(
        ((texels >> 16) & 0xFF).astype(dtype) / c255,
        ((texels >> 8) & 0xFF).astype(dtype) / c255,
        (texels & 0xFF).astype(dtype) / c255,
    )


def bilinear_from_low_tap(flat_table: jnp.ndarray, idx00: jnp.ndarray,
                          wu: jnp.ndarray, wv: jnp.ndarray, dim: int):
    """Reconstruct sample_skybox(bilinear=True)'s 4-tap filter from the
    DEFERRED per-ray triple (idx00, wu, wv) alone — the Pallas kernels'
    epilogue contract (idx00 = face*dim^2 + v0*dim + u0 with the
    floor-based texel-center mapping; see
    render_pallas._sky_texel_index_bilinear). The neighbor indices
    derive from idx00 + dim (per-component clamping keeps taps on the
    face), and the lerp runs in the oracle's exact op order — this is a
    BIT-EXACTNESS contract shared by both production kernels, so it
    lives in one place. Returns (r, g, b) f32 arrays.

    Fetch strategy: the row-gather cost is ~2 cycles/row REGARDLESS of
    row width (fetch_packed_texels's measurement), so instead of FOUR
    row gathers (one per tap — the formulation that measured ~4x the
    single-tap tier) we build a QUAD-PACKED table whose row i holds all
    four clamped taps of low corner i — pure shifted slices, no gathers,
    ~4x the table bytes streamed once per frame — and fetch each ray's
    filter footprint with ONE 16-wide row gather (4 quads/row) + a
    4-group one-hot select. The quad entries are the identical packed
    u32 texels the 4-gather form fetched (same min(·+1, dim-1) edge
    clamp), and the lerp order is unchanged, so the result is
    bit-identical; tests/test_skybox.py asserts exact equality against
    the no-compression reference."""
    n = flat_table.shape[0]
    c255 = jnp.asarray(255.0, jnp.float32)
    if n % (dim * dim) == 0 and n % 4 == 0 and idx00.ndim == 1:
        t = flat_table.reshape(-1, dim, dim)
        t01 = jnp.concatenate([t[:, :, 1:], t[:, :, -1:]], axis=2)
        t10 = jnp.concatenate([t[:, 1:, :], t[:, -1:, :]], axis=1)
        t11 = jnp.concatenate([t01[:, 1:, :], t01[:, -1:, :]], axis=1)
        quad = jnp.stack(
            [t.reshape(-1), t01.reshape(-1), t10.reshape(-1),
             t11.reshape(-1)], axis=-1)  # (n, 4): [c00, c01, c10, c11]
        rows = jnp.take(quad.reshape(n // 4, 16), idx00 >> 2, axis=0)
        group = (idx00 & 3).astype(jnp.int32)
        onehot = group[:, None] == jnp.arange(4, dtype=jnp.int32)[None, :]
        taps = jnp.sum(
            jnp.where(onehot[:, :, None], rows.reshape(-1, 4, 4),
                      jnp.zeros((), flat_table.dtype)),
            axis=1, dtype=flat_table.dtype)  # (M, 4) packed u32 taps

        def unpack(tx):
            return (((tx >> 16) & 0xFF).astype(jnp.float32) / c255,
                    ((tx >> 8) & 0xFF).astype(jnp.float32) / c255,
                    (tx & 0xFF).astype(jnp.float32) / c255)

        c00, c01 = unpack(taps[:, 0]), unpack(taps[:, 1])
        c10, c11 = unpack(taps[:, 2]), unpack(taps[:, 3])
    else:
        # fallback (tiny/odd test cubemaps): four row gathers
        u0 = idx00 % dim
        v0 = (idx00 // dim) % dim
        base = idx00 - v0 * dim - u0  # face * dim^2
        u1 = jnp.minimum(u0 + 1, dim - 1)
        v1 = jnp.minimum(v0 + 1, dim - 1)

        def tap(vi, ui):
            tx = fetch_packed_texels(flat_table, base + vi * dim + ui)
            return (((tx >> 16) & 0xFF).astype(jnp.float32) / c255,
                    ((tx >> 8) & 0xFF).astype(jnp.float32) / c255,
                    (tx & 0xFF).astype(jnp.float32) / c255)

        c00, c01 = tap(v0, u0), tap(v0, u1)
        c10, c11 = tap(v1, u0), tap(v1, u1)
    out = []
    for ch in range(3):
        top = c00[ch] * (1.0 - wu) + c01[ch] * wu
        bot = c10[ch] * (1.0 - wu) + c11[ch] * wu
        out.append(top * (1.0 - wv) + bot * wv)
    return tuple(out)


def sample_skybox(skybox: Skybox, d: Vec3, *, bilinear: bool = False) -> Vec3:
    """Sample the cubemap along direction batch ``d``; returns float colors
    in [0,1]. One packed-u32 gather per sample (the gather is the hot
    memory op of the renderer; packing collapses 3 channel gathers into 1).
    ``bilinear=False`` is the reference's nearest-texel fetch
    (TerminalRayTracer.c:782-788); ``bilinear=True`` implements the
    reference's roadmap item (TerminalRayTracer.c:23)."""
    dtype = d.x.dtype
    face, u, v = skybox_uv(d)
    dim = skybox.dim
    flat = skybox.packed.reshape(-1)
    if not bilinear:
        # nearest: (int)((u+0.5)*dim), truncation == floor for u+0.5 >= 0
        ui = jnp.minimum(((u + 0.5) * dim).astype(jnp.int32), dim - 1)
        vi = jnp.minimum(((v + 0.5) * dim).astype(jnp.int32), dim - 1)
        idx = face * (dim * dim) + vi * dim + ui
        if idx.ndim == 1:
            return _unpack(fetch_packed_texels(flat, idx), dtype)
        return _unpack(jnp.take(flat, idx), dtype)

    # bilinear: texel centers at (i + 0.5)/dim
    fu = (u + 0.5) * dim - 0.5
    fv = (v + 0.5) * dim - 0.5
    u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, dim - 1)
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, dim - 1)
    u1 = jnp.minimum(u0 + 1, dim - 1)
    v1 = jnp.minimum(v0 + 1, dim - 1)
    wu = jnp.clip(fu - u0.astype(dtype), 0.0, 1.0)
    wv = jnp.clip(fv - v0.astype(dtype), 0.0, 1.0)
    base = face * (dim * dim)

    def fetch(vi, ui):
        return _unpack(jnp.take(flat, base + vi * dim + ui), dtype)

    c00, c01 = fetch(v0, u0), fetch(v0, u1)
    c10, c11 = fetch(v1, u0), fetch(v1, u1)
    top = c00 * (1.0 - wu) + c01 * wu
    bot = c10 * (1.0 - wu) + c11 * wu
    return top * (1.0 - wv) + bot * wv
