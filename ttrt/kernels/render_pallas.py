"""Pallas TPU render kernel: the full bounce loop per VMEM-resident ray tile.

Why a hand-written kernel beats the fused-XLA path (ttrt.render.integrator):
the XLA `lax.while_loop` carries ~20 state arrays of H*W*spp lanes through
HBM on EVERY bounce iteration — >200 MB of round-trip traffic per iteration
at the reference workload, which makes the renderer HBM-bound. This kernel
tiles the flat ray batch into (TILE_R, 128) blocks and runs the ENTIRE
masked bounce loop (primary trace + shadow traces + shading + reflection)
on one tile while its state lives in VMEM/registers. HBM traffic collapses
to: scene scalars in (SMEM), per-ray results out (16 bytes/ray).

Rays are not even streamed in: the kernel derives each lane's (row, col,
sample) from `program_id` + iota and generates the primary ray in-kernel,
reproducing the reference's deterministic triangle-wave AA offsets
(TerminalRayTracer.c:978-1011).

The ONE per-lane memory op the tracer needs — the skybox texel gather
(get_skybox_color, TerminalRayTracer.c:700-789) — is deferred out of the
kernel: a ray reaches the sky at most once, as its final contribution, so
the kernel computes the flat texel INDEX and the contribution WEIGHT at sky
termination and the caller performs a single XLA gather over the ray batch
afterwards. This keeps Mosaic's limited dynamic-gather support off the hot
path entirely (same trick as the fused-XLA integrator, SURVEY.md §3.3).

Semantics are the reference's exactly — same op order as the jnp oracle in
ttrt.render (which golden-tests against the compiled C): sphere/plane
intersection quirks (TerminalRayTracer.c:638-695), EPSILON back-offset
(:870-874), checker parity (:850), un-clamped-below n.l (:911,:945), the
point-light occlusion comparison (:937-942), contribution-weighted bounce
accumulation (:1012-1065).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttrt.config import ConfigError, RenderConfig, constants
from ttrt.render.skybox import (CUBEMAP_AXES, U_AXIS, V_AXIS,
                               fetch_packed_texels)
from ttrt.scene import Scene
from ttrt.vec import Vec3

# Tile geometry: (TILE_R, 128) rays per grid step. 16 sublane-groups of f32
# — the sweet spot for the fully-unrolled bounce chain (32 doubles both
# compile time and register pressure for no speedup).
TILE_R = 16
LANES = 128


_F32_MAX = float(np.finfo(np.float32).max)


# ---------------------------------------------------------------------------
# Scene packing: pytree scene -> flat f32 arrays for SMEM
# ---------------------------------------------------------------------------


class PackedScene(NamedTuple):
    """Flat scalar views of the scene for SMEM prefetch. All f32 (or the
    config dtype); static counts live in the kernel closure."""

    cam: jnp.ndarray  # (17,) bx3 by3 bz3 origin3 sz sw sh row_off samp_off
    spheres: jnp.ndarray  # (n_spheres*9,) cx cy cz r cr cg cb refl spec
    plane: jnp.ndarray  # (16,) p3 n3 even(rgb,refl) odd(rgb,refl) spec e/o
    dlights: jnp.ndarray  # (n_dl*6,) normalized -dir (guarded) 3, color 3
    plights: jnp.ndarray  # (n_pl*7,) pos3 color3 intensity


def pack_camera(cam, dtype, row_offset=0.0, sample_offset=0.0) -> jnp.ndarray:
    """(17,) SMEM camera row: basis (9), origin (3), -screen_distance,
    screen_w/h, row_offset, sample_offset. ``row_offset``/``sample_offset``
    (may be traced, e.g. from lax.axis_index under shard_map) shift the
    kernel's ray-generation rows and AA-sample indices — multi-chip
    sharding renders one (row band x sample slice) per device. Shared by
    the demo kernel and the fused mesh kernel (ttrt.kernels.mesh_fused)."""
    f = cam.frame
    return jnp.concatenate(
        [
            f.basis.reshape(-1).astype(dtype),  # rows: bx, by, bz
            f.origin.astype(dtype),
            jnp.stack(
                [
                    -cam.screen_distance.astype(dtype),
                    cam.screen_width.astype(dtype),
                    cam.screen_height.astype(dtype),
                    jnp.asarray(row_offset, dtype),
                    jnp.asarray(sample_offset, dtype),
                ]
            ),
        ]
    )


def pack_dlights(dl, dtype) -> jnp.ndarray:
    """(n_dl*6,) SMEM rows: pre-negated + guard-normalized direction
    (scalar math, identical bits to the in-loop normalize at
    TerminalRayTracer.c:905), then color."""
    neg = Vec3(-dl.direction.x, -dl.direction.y, -dl.direction.z)
    ndir = neg.normalize()  # guarded (TerminalRayTracer.c:444)
    return jnp.stack(
        [ndir.x, ndir.y, ndir.z, dl.color.x, dl.color.y, dl.color.z],
        axis=-1,
    ).reshape(-1).astype(dtype)


def pack_plights(pls, dtype) -> jnp.ndarray:
    """(n_pl*7,) SMEM rows: position, color, intensity."""
    return jnp.stack(
        [
            pls.position.x, pls.position.y, pls.position.z,
            pls.color.x, pls.color.y, pls.color.z, pls.intensity,
        ],
        axis=-1,
    ).reshape(-1).astype(dtype)


def pack_scene(scene: Scene, dtype, row_offset=0.0,
               sample_offset=0.0) -> PackedScene:
    """Flatten the scene pytree into the SMEM layout."""
    cam_flat = pack_camera(scene.camera, dtype, row_offset, sample_offset)

    sph = scene.spheres
    sph_flat = jnp.stack(
        [
            sph.center.x,
            sph.center.y,
            sph.center.z,
            sph.radius,
            sph.material.color.x,
            sph.material.color.y,
            sph.material.color.z,
            sph.material.reflectivity,
            sph.material.specularity,
        ],
        axis=-1,
    ).reshape(-1).astype(dtype)

    g = scene.ground
    plane_flat = jnp.stack(
        [
            g.point.x, g.point.y, g.point.z,
            g.normal.x, g.normal.y, g.normal.z,
            g.even_material.color.x, g.even_material.color.y,
            g.even_material.color.z, g.even_material.reflectivity,
            g.odd_material.color.x, g.odd_material.color.y,
            g.odd_material.color.z, g.odd_material.reflectivity,
            g.even_material.specularity, g.odd_material.specularity,
        ]
    ).astype(dtype)

    dl_flat = pack_dlights(scene.directional_lights, dtype)
    pl_flat = pack_plights(scene.point_lights, dtype)

    return PackedScene(cam_flat, sph_flat, plane_flat, dl_flat, pl_flat)


# ---------------------------------------------------------------------------
# In-kernel math (operates on (TILE_R, 128) arrays + traced scalars)
# ---------------------------------------------------------------------------


def _normalize3(x, y, z):
    """Guarded normalize (TerminalRayTracer.c:439-450): identity when the
    length is <= 1e-4. rsqrt form: one transcendental, zero divisions
    (the guard compares the SQUARED length, so no sqrt either)."""
    len2 = x * x + y * y + z * z
    ok = len2 > constants.NORMALIZE_GUARD * constants.NORMALIZE_GUARD
    inv = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, len2, 1.0)), 1.0)
    return x * inv, y * inv, z * inv


class _TraceOut(NamedTuple):
    is_hit: jnp.ndarray  # bool
    px: jnp.ndarray  # EPSILON-offset hit point (miss: ray origin)
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray  # normalized hit normal (miss: ray direction)
    ny: jnp.ndarray
    nz: jnp.ndarray
    cr: jnp.ndarray  # material color (miss lanes: garbage, masked out)
    cg: jnp.ndarray
    cb: jnp.ndarray
    refl: jnp.ndarray  # reflectivity (miss: 0)
    spec: jnp.ndarray  # material specularity (zeros unless want_spec)


def _trace(ox, oy, oz, dx, dy, dz, sph_vals, plane_vals,
           want_spec: bool = False) -> _TraceOut:
    """Nearest-hit trace of one ray tile against all spheres + the ground
    plane (trace_ray, TerminalRayTracer.c:793-889). ``sph_vals`` is a list
    of 8-tuples of traced scalars.

    Speed-of-light restructuring of the C (documented deltas are all
    last-ulp-level vs the jnp oracle):
      - the sphere hit test ``disc >= 0 && t0 > 0`` is evaluated without
        sqrt or division: for a>0, t0 = (-b-sqrt(disc))/(2a) > 0 iff
        b < 0 and c > 0 (b^2 > disc expands to 4ac > 0);
      - the nearest-object compare uses t directly (the C compares squared
        DISTANCE, but with one shared origin sqdist = t^2*|d|^2 is
        monotonic in t>0) — so the per-sphere loop tracks only (t, id
        attributes) and the hit POINT/normal are computed once for the
        winner after the scan, not per candidate;
      - one sqrt per winning lane instead of one per sphere, one shared
        1/(2a) instead of a division per sphere."""
    shape = ox.shape
    dtype = ox.dtype

    a = dx * dx + dy * dy + dz * dz  # shared across spheres
    inv2a = 0.5 / a

    best_t = jnp.full(shape, _F32_MAX, dtype)
    # winner attributes: sphere center (for the normal) + material
    bcx = jnp.zeros(shape, dtype)
    bcy = jnp.zeros(shape, dtype)
    bcz = jnp.zeros(shape, dtype)
    bcr = jnp.zeros(shape, dtype)
    bcg = jnp.zeros(shape, dtype)
    bcb = jnp.zeros(shape, dtype)
    brefl = jnp.zeros(shape, dtype)
    bspec = jnp.zeros(shape, dtype)
    hit_sphere = jnp.zeros(shape, jnp.bool_)

    for (cx, cy, cz, r, scr, scg, scb, srefl, sspec) in sph_vals:
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - 4.0 * a * c
        hit = (disc >= 0.0) & (b < 0.0) & (c > 0.0)
        t0 = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv2a
        take = hit & (t0 < best_t)
        best_t = jnp.where(take, t0, best_t)
        hit_sphere = hit_sphere | take
        bcx = jnp.where(take, cx, bcx)
        bcy = jnp.where(take, cy, bcy)
        bcz = jnp.where(take, cz, bcz)
        bcr = jnp.where(take, scr, bcr)
        bcg = jnp.where(take, scg, bcg)
        bcb = jnp.where(take, scb, bcb)
        brefl = jnp.where(take, srefl, brefl)
        if want_spec:
            bspec = jnp.where(take, sspec, bspec)

    # Ground plane (TerminalRayTracer.c:830-853); same-origin t compare.
    (ppx, ppy, ppz, pnx, pny, pnz,
     ecr, ecg, ecb, erefl, ocr_, ocg_, ocb_, orefl,
     espec, ospec) = plane_vals
    denom = dx * pnx + dy * pny + dz * pnz
    safe = jnp.where(denom == 0.0, 1.0, denom)
    tp = ((ppx - ox) * pnx + (ppy - oy) * pny + (ppz - oz) * pnz) / safe
    phit = (jnp.abs(denom) > constants.PLANE_DENOM_EPS) & (
        tp > constants.PLANE_T_EPS
    )
    take_p = phit & (tp < best_t)
    best_t = jnp.where(take_p, tp, best_t)
    hit_any = hit_sphere | take_p

    # winner point / normal / material, computed ONCE
    t = jnp.where(hit_any, best_t, 0.0)
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz

    parity = (jnp.floor(px) + jnp.floor(pz)).astype(jnp.int32) & 1
    odd = parity == 1
    pcr = jnp.where(odd, ocr_, ecr)
    pcg = jnp.where(odd, ocg_, ecg)
    pcb = jnp.where(odd, ocb_, ecb)
    prefl = jnp.where(odd, orefl, erefl)

    cr = jnp.where(take_p, pcr, bcr)
    cg = jnp.where(take_p, pcg, bcg)
    cb = jnp.where(take_p, pcb, bcb)
    refl = jnp.where(take_p, prefl, brefl)
    if want_spec:
        pspec = jnp.where(odd, ospec, espec)
        bspec = jnp.where(take_p, pspec, bspec)
    nxr = jnp.where(take_p, pnx, px - bcx)
    nyr = jnp.where(take_p, pny, py - bcy)
    nzr = jnp.where(take_p, pnz, pz - bcz)

    # hit fixups (TerminalRayTracer.c:858-886): EPSILON back-offset through a
    # guarded normalize; on miss point = origin, normal = direction.
    tox, toy, toz = _normalize3(ox - px, oy - py, oz - pz)
    eps = constants.EPSILON
    px = jnp.where(hit_any, px + tox * eps, ox)
    py = jnp.where(hit_any, py + toy * eps, oy)
    pz = jnp.where(hit_any, pz + toz * eps, oz)
    nx, ny, nz = _normalize3(
        jnp.where(hit_any, nxr, dx),
        jnp.where(hit_any, nyr, dy),
        jnp.where(hit_any, nzr, dz),
    )
    refl = jnp.where(hit_any, refl, 0.0)
    return _TraceOut(hit_any, px, py, pz, nx, ny, nz, cr, cg, cb, refl,
                     bspec)


def _shadow_oc_terms(px, py, pz, sph_vals):
    """Per-sphere (oc vector, c term) for a shadow ORIGIN — shared by every
    shadow ray cast from the same hit point (both lights), saving the
    origin-dependent half of the quadratic per extra light."""
    return [
        (px - cx, py - cy, pz - cz,
         (px - cx) ** 2 + (py - cy) ** 2 + (pz - cz) ** 2 - r * r)
        for (cx, cy, cz, r, *_mat) in sph_vals
    ]


def _shadow_any_hit(px, py, pz, ldx, ldy, ldz, a, tmax, oc_terms,
                    plane_vals):
    """Occlusion-only trace: does any object block the ray before ``tmax``
    (pass None for the directional-light no-cutoff case)?

    The reference's shadow rays are full nearest-hit traces whose ONLY
    consumed outputs are hit/no-hit and (for point lights) the blocker
    distance vs the light distance (TerminalRayTracer.c:907, 937-942) —
    "nearest blocker closer than the light" is equivalent to "any blocker
    closer than the light", so an any-hit scan with a t cutoff gives the
    same answer with no sqrt, no division, no winner tracking.
    ``a`` is the squared length of the shadow direction (1 for normalized)."""
    blocked = jnp.zeros(px.shape, jnp.bool_)
    for (ocx, ocy, ocz, c) in oc_terms:
        b = 2.0 * (ocx * ldx + ocy * ldy + ocz * ldz)
        disc = b * b - 4.0 * a * c
        hit = (disc >= 0.0) & (b < 0.0) & (c > 0.0)
        if tmax is not None:
            # t0 < tmax  <=>  sqrt(disc) > -b - 2*a*tmax (all quantities
            # formed without the sqrt by squaring the positive branch)
            rhs = -b - 2.0 * a * tmax
            hit = hit & ((rhs < 0.0) | (disc > rhs * rhs))
        blocked = blocked | hit

    (ppx, ppy, ppz, pnx, pny, pnz, *_rest) = plane_vals
    denom = ldx * pnx + ldy * pny + ldz * pnz
    safe = jnp.where(denom == 0.0, 1.0, denom)
    tp = ((ppx - px) * pnx + (ppy - py) * pny + (ppz - pz) * pnz) / safe
    phit = (jnp.abs(denom) > constants.PLANE_DENOM_EPS) & (
        tp > constants.PLANE_T_EPS
    )
    if tmax is not None:
        phit = phit & (tp < tmax)
    return blocked | phit


def _apply_lighting(
    px, py, pz, nx, ny, nz, mcr, mcg, mcb,
    dl_vals, pl_vals, sph_vals, plane_vals,
    view=None, mspec=None,
):
    """Diffuse shading with any-hit shadow traces (apply_lighting,
    TerminalRayTracer.c:894-963). Returns lit (r, g, b) clamped to [0,1].

    ``view``/``mspec`` (the view vector -d and the winner material's
    specularity) switch on the Blinn-Phong specular EXTENSION — the
    reference's commented-out term (TerminalRayTracer.c:913-916,
    947-950), mirroring ttrt.render.lighting.apply_lighting's
    ``specular=True`` math op-for-op."""
    outr = jnp.zeros_like(px)
    outg = jnp.zeros_like(px)
    outb = jnp.zeros_like(px)
    one = jnp.ones_like(px)
    oc_terms = _shadow_oc_terms(px, py, pz, sph_vals)
    clamp01 = lambda v: jnp.minimum(jnp.maximum(v, 0.0), 1.0)
    if view is not None:
        vx, vy, vz = view

    for (lx, ly, lz, lcr, lcg, lcb) in dl_vals:
        # light direction is a unit scalar vector -> a == 1
        blocked = _shadow_any_hit(
            px, py, pz, lx * one, ly * one, lz * one, 1.0, None,
            oc_terms, plane_vals,
        )
        ndotl = jnp.minimum(nx * lx + ny * ly + nz * lz, 1.0)  # fmin only
        cr = lcr * ndotl * mcr
        cg = lcg * ndotl * mcg
        cb = lcb * ndotl * mcb
        if view is not None:
            hx, hy, hz = _normalize3(lx + vx, ly + vy, lz + vz)
            s = jnp.power(
                clamp01(nx * hx + ny * hy + nz * hz), mspec
            )
            cr = cr + lcr * s
            cg = cg + lcg * s
            cb = cb + lcb * s
        outr = outr + jnp.where(blocked, 0.0, cr)
        outg = outg + jnp.where(blocked, 0.0, cg)
        outb = outb + jnp.where(blocked, 0.0, cb)

    for (lpx, lpy, lpz, lcr, lcg, lcb, inten) in pl_vals:
        lvx, lvy, lvz = lpx - px, lpy - py, lpz - pz
        light_d2 = lvx * lvx + lvy * lvy + lvz * lvz
        intensity = jnp.minimum(jnp.maximum(inten / light_d2, 0.0), 1.0)
        ldx, ldy, ldz = _normalize3(lvx, lvy, lvz)
        # normalized direction -> a = 1, cutoff at the light's distance
        # (blocker-beyond-the-light does not occlude, c:942)
        tmax = jnp.sqrt(light_d2)
        blocked = _shadow_any_hit(
            px, py, pz, ldx, ldy, ldz, 1.0, tmax, oc_terms, plane_vals,
        )
        ndotl = jnp.minimum(nx * ldx + ny * ldy + nz * ldz, 1.0)
        scale = intensity * ndotl
        cr = lcr * scale * mcr
        cg = lcg * scale * mcg
        cb = lcb * scale * mcb
        if view is not None:
            hx, hy, hz = _normalize3(ldx + vx, ldy + vy, ldz + vz)
            s = intensity * jnp.power(
                clamp01(nx * hx + ny * hy + nz * hz), mspec
            )
            cr = cr + lcr * s
            cg = cg + lcg * s
            cb = cb + lcb * s
        outr = outr + jnp.where(blocked, 0.0, cr)
        outg = outg + jnp.where(blocked, 0.0, cg)
        outb = outb + jnp.where(blocked, 0.0, cb)

    return clamp01(outr), clamp01(outg), clamp01(outb)  # c:960


def _sky_face_uv_cont(dx, dy, dz):
    """(face, u, v) with u, v CONTINUOUS in [-0.5, 0.5] — the
    pre-quantization uv of get_skybox_color (TerminalRayTracer.c:700-777)
    with the per-face uv fixups folded into the U_AXIS/V_AXIS tables
    (ttrt.render.skybox). Branch-free: the 6-way face select is an
    unrolled masked max; axis/uv tables are baked Python constants
    selected by where-chains."""
    ddx, ddy, ddz = _normalize3(dx, dy, dz)

    best = None
    face = None
    for f in range(6):
        ax, ay, az = (float(v) for v in CUBEMAP_AXES[f])
        d = ddx * ax + ddy * ay + ddz * az
        if best is None:
            best, face = d, jnp.zeros_like(dx, jnp.int32)
        else:
            m = d > best
            best = jnp.where(m, d, best)
            face = jnp.where(m, f, face)

    inv = 1.0 / best
    sx, sy, sz = ddx * inv, ddy * inv, ddz * inv

    # per-face constants via where-chains (face is int32 tile)
    def sel(table_col):
        out = jnp.full_like(dx, float(table_col[0]))
        for f in range(1, 6):
            out = jnp.where(face == f, float(table_col[f]), out)
        return out

    axx, axy, axz = sel(CUBEMAP_AXES[:, 0]), sel(CUBEMAP_AXES[:, 1]), sel(CUBEMAP_AXES[:, 2])
    # C recomputes t = dot(scaled, axis) (TerminalRayTracer.c:720)
    t2 = sx * axx + sy * axy + sz * axz
    ox_ = (sx - t2 * axx) * 0.5
    oy_ = (sy - t2 * axy) * 0.5
    oz_ = (sz - t2 * axz) * 0.5

    u = ox_ * sel(U_AXIS[:, 0]) + oy_ * sel(U_AXIS[:, 1]) + oz_ * sel(U_AXIS[:, 2])
    v = ox_ * sel(V_AXIS[:, 0]) + oy_ * sel(V_AXIS[:, 1]) + oz_ * sel(V_AXIS[:, 2])
    u = jnp.minimum(jnp.maximum(u, -0.5), 0.5)
    v = jnp.minimum(jnp.maximum(v, -0.5), 0.5)
    return face, u, v


def _sky_face_uv(dx, dy, dz, dim: int):
    """(face, ui, vi) NEAREST texel coordinates (the reference's int
    truncation, TerminalRayTracer.c:778-788)."""
    face, u, v = _sky_face_uv_cont(dx, dy, dz)
    ui = jnp.minimum(((u + 0.5) * dim).astype(jnp.int32), dim - 1)
    vi = jnp.minimum(((v + 0.5) * dim).astype(jnp.int32), dim - 1)
    return face, ui, vi


def _sky_texel_index(dx, dy, dz, dim: int):
    """Flat texel index (face*dim^2 + v*dim + u) for the deferred gather."""
    face, ui, vi = _sky_face_uv(dx, dy, dz, dim)
    return face * (dim * dim) + vi * dim + ui


def _sky_texel_index_bilinear(dx, dy, dz, dim: int):
    """(idx00, wu, wv) for the DEFERRED 4-tap bilinear image-cubemap
    gather: idx00 is the flat index of the low-corner tap (same packed
    face*dim^2 + v0*dim + u0 format the nearest path rides in the
    counter stream, but with sample_skybox(bilinear=True)'s floor-based
    texel-center mapping, ttrt.render.skybox), and wu/wv are its f32
    fractional weights. The XLA epilogue derives the three clamped
    neighbor indices from idx00 + dim alone (u1 = min(u0+1, dim-1) etc.
    — clamping is per-component, so neighbors never leave the face) and
    lerps in exactly the oracle's op order."""
    face, u, v = _sky_face_uv_cont(dx, dy, dz)
    fu = (u + 0.5) * dim - 0.5
    fv = (v + 0.5) * dim - 0.5
    u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, dim - 1)
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, dim - 1)
    wu = jnp.clip(fu - u0.astype(jnp.float32), 0.0, 1.0)
    wv = jnp.clip(fv - v0.astype(jnp.float32), 0.0, 1.0)
    return face * (dim * dim) + v0 * dim + u0, wu, wv


# face colors of the 'colors' debug cubemap, /255 (ttrt.assets
# make_colors_skybox): +X red, -X cyan, +Y green, -Y magenta, +Z blue,
# -Z yellow — all channel values are exactly 0.0 or 1.0.
_FACE_COLORS01 = (
    (1.0, 0.0, 0.0),
    (0.0, 1.0, 1.0),
    (0.0, 1.0, 0.0),
    (1.0, 0.0, 1.0),
    (0.0, 0.0, 1.0),
    (1.0, 1.0, 0.0),
)


def _procedural_texel(face, ui, vi, dim: int, kind: str):
    """Color of texel (face, row vi, column ui) of a PROCEDURAL cubemap,
    bit-identical to the stored table (the generators in ttrt.assets
    compute in pure float32 with exactly this op order, then quantize
    with (x*255) truncation; we replay that and divide back by 255)."""

    def sel(table_col):
        out = jnp.full_like(ui.astype(jnp.float32), float(table_col[0]))
        for f in range(1, 6):
            out = jnp.where(face == f, float(table_col[f]), out)
        return out

    hue_r = sel([c[0] for c in _FACE_COLORS01])
    hue_g = sel([c[1] for c in _FACE_COLORS01])
    hue_b = sel([c[2] for c in _FACE_COLORS01])

    if kind == "colors":
        # texels are exactly 0 or 255; quantization round-trips exactly
        return hue_r, hue_g, hue_b

    if kind != "uv_checker":
        raise ValueError(f"unknown procedural skybox {kind!r}")

    # true division matches the generator's arange(dim)/dim for ANY dim
    u01 = ui.astype(jnp.float32) / jnp.float32(dim)
    v01 = vi.astype(jnp.float32) / jnp.float32(dim)
    squares = jnp.float32(8.0)
    checker = jnp.mod(
        jnp.floor(u01 * squares) + jnp.floor(v01 * squares),
        jnp.float32(2.0),
    )
    shade = jnp.float32(0.25) + jnp.float32(0.5) * checker
    clamp01 = lambda x: jnp.minimum(jnp.maximum(x, 0.0), 1.0)
    r = clamp01(hue_r * shade + jnp.float32(0.3) * u01)
    g = clamp01(hue_g * shade + jnp.float32(0.3) * v01)
    b = hue_b * shade
    # replay the generator's (x*255) -> uint8 truncation -> /255
    q = lambda x: (x * 255.0).astype(jnp.int32).astype(jnp.float32) / 255.0
    return q(r), q(g), q(b)


def _sky_color_procedural(dx, dy, dz, dim: int, kind: str):
    """NEAREST-texel procedural cubemap evaluation in-kernel. Eliminates
    the deferred texel gather — by far the most expensive operation of
    the whole renderer (XLA per-element gathers: ~8 ns each, ~10 ms/frame
    at the reference workload)."""
    face, ui, vi = _sky_face_uv(dx, dy, dz, dim)
    return _procedural_texel(face, ui, vi, dim, kind)


def _sky_color_procedural_bilinear(dx, dy, dz, dim: int, kind: str):
    """4-tap BILINEAR procedural cubemap evaluation in-kernel,
    gather-free: evaluates the pattern at the four neighboring texel
    centers and blends with exactly sample_skybox(bilinear=True)'s op
    order (ttrt.render.skybox), so it matches the XLA extension path
    bit-for-bit at identical (face, u, v). Taps clamp within the face,
    as the XLA path. Serves the reference's bilinear roadmap item
    (TerminalRayTracer.c:21-33) on the production kernel for procedural
    skies; IMAGE cubemaps stay XLA-owned — there a 4-tap filter would
    quadruple the measured gather bound (see render_frame_pallas's
    design note)."""
    face, u, v = _sky_face_uv_cont(dx, dy, dz)
    fu = (u + 0.5) * dim - 0.5
    fv = (v + 0.5) * dim - 0.5
    u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, dim - 1)
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, dim - 1)
    u1 = jnp.minimum(u0 + 1, dim - 1)
    v1 = jnp.minimum(v0 + 1, dim - 1)
    wu = jnp.clip(fu - u0.astype(jnp.float32), 0.0, 1.0)
    wv = jnp.clip(fv - v0.astype(jnp.float32), 0.0, 1.0)
    c00 = _procedural_texel(face, u0, v0, dim, kind)
    c01 = _procedural_texel(face, u1, v0, dim, kind)
    c10 = _procedural_texel(face, u0, v1, dim, kind)
    c11 = _procedural_texel(face, u1, v1, dim, kind)
    out = []
    for ch in range(3):
        top = c00[ch] * (1.0 - wu) + c01[ch] * wu
        bot = c10[ch] * (1.0 - wu) + c11[ch] * wu
        out.append(top * (1.0 - wv) + bot * wv)
    return tuple(out)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _read_tuples(ref, n: int, width: int) -> list:
    """Read n groups of `width` scalars from a flat SMEM ref."""
    return [
        tuple(ref[i * width + j] for j in range(width)) for i in range(n)
    ]


def _render_kernel_acc(
    cam_ref, sph_ref, plane_ref, dl_ref, pl_ref,  # SMEM scene scalars
    pix_r_ref, pix_g_ref, pix_b_ref, count_ref,  # pixel-rate accumulators
    *,
    cfg: RenderConfig,
    n_spheres: int,
    n_dl: int,
    n_pl: int,
    sky_dim: int,
    tile_r: int,
    procedural: str,
):
    """Sample-accumulating variant for PROCEDURAL skyboxes: grid is
    (pixel_tiles, spp); each step renders ONE AA sample of a pixel tile,
    finalizes it completely in-kernel (sky fold + contribution-total
    normalization, TerminalRayTracer.c:1061-1065), and += into the
    pixel-rate output block — which stays VMEM-resident across the sample
    dimension (the output index_map ignores the sample index). Kills the
    sample-rate epilogue entirely: outputs shrink spp-fold and the XLA
    tail reduces to one *(1/spp) pass."""
    W, H, N = cfg.width, cfg.height, cfg.rays_per_pixel
    n_pixels = W * H

    i = pl.program_id(0)  # pixel tile
    ks = pl.program_id(1)  # AA sample
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_r, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (tile_r, LANES), 1)
    )
    pix = i * (tile_r * LANES) + lane
    lane_valid = pix < n_pixels
    col = (pix % W).astype(jnp.float32)
    row = (pix // W).astype(jnp.float32)
    kf = ks.astype(jnp.float32)

    bx0, bx1, bx2 = cam_ref[0], cam_ref[1], cam_ref[2]
    by0, by1, by2 = cam_ref[3], cam_ref[4], cam_ref[5]
    bz0, bz1, bz2 = cam_ref[6], cam_ref[7], cam_ref[8]
    cox, coy, coz = cam_ref[9], cam_ref[10], cam_ref[11]
    szc, sw, sh = cam_ref[12], cam_ref[13], cam_ref[14]
    pixel_w = sw / W
    pixel_h = sh / H

    def tri(t):
        m = jnp.mod(t, 2.0 * constants.PI)
        return jnp.where(
            m < constants.PI, m / constants.PI, 2.0 - m / constants.PI
        )

    # per-sample jitter is SCALAR here (one sample per grid step)
    jit_x = tri(2.0 * constants.PI * kf / N) / 2.0 * pixel_w
    jit_y = tri(constants.PI * kf / N) / 2.0 * pixel_h
    sxv = (col / W) * sw - sw / 2.0 + jit_x
    syv = -((row / H) * sh - sh / 2.0) + jit_y
    dx, dy, dz = _normalize3(
        sxv * bx0 + syv * by0 + szc * bz0 - cox,
        sxv * bx1 + syv * by1 + szc * bz1 - coy,
        sxv * bx2 + syv * by2 + szc * bz2 - coz,
    )
    ox = jnp.full_like(dx, cox)
    oy = jnp.full_like(dx, coy)
    oz = jnp.full_like(dx, coz)

    sph_vals = _read_tuples(sph_ref, n_spheres, 9)
    plane_vals = tuple(plane_ref[i] for i in range(16))
    dl_vals = _read_tuples(dl_ref, n_dl, 6)
    pl_vals = _read_tuples(pl_ref, n_pl, 7)

    (pr, pg, pb, total, sky_w, count, dx, dy, dz) = _bounce_chain(
        ox, oy, oz, dx, dy, dz, lane_valid,
        sph_vals, plane_vals, dl_vals, pl_vals, cfg.bounce_limit,
        specular=cfg.specular,
        energy_subtract=cfg.energy_model == "subtract",
    )

    sky_eval = (_sky_color_procedural_bilinear if cfg.skybox_bilinear
                else _sky_color_procedural)
    skr, skg, skb = sky_eval(dx, dy, dz, sky_dim, procedural)
    # finalize THIS sample: (pixel + w*sky) / contribution_total
    # (guard the padding lanes' total==0; they are sliced off outside);
    # the subtract model's weights already partition unity — no divide
    if cfg.energy_model == "subtract":
        inv_total = 1.0
    else:
        inv_total = 1.0 / jnp.where(total > 0.0, total, 1.0)
    cr = (pr + sky_w * skr) * inv_total
    cg = (pg + sky_w * skg) * inv_total
    cb = (pb + sky_w * skb) * inv_total

    @pl.when(ks == 0)
    def _():
        pix_r_ref[0] = jnp.zeros_like(cr)
        pix_g_ref[0] = jnp.zeros_like(cg)
        pix_b_ref[0] = jnp.zeros_like(cb)
        count_ref[0] = jnp.zeros_like(count)

    pix_r_ref[0] = pix_r_ref[0] + cr
    pix_g_ref[0] = pix_g_ref[0] + cg
    pix_b_ref[0] = pix_b_ref[0] + cb
    # this layout SUMS counters over the sample grid axis, so repack the
    # 5|5-bit per-sample fields into 16|16 (spp * bounce_limit < 2^16)
    count_ref[0] = count_ref[0] + (
        (count & 0x1F) | (((count >> 5) & 0x1F) << 16)
    )


def _bounce_chain(ox, oy, oz, dx, dy, dz, lane_valid, sph_vals, plane_vals,
                  dl_vals, pl_vals, bounce_limit: int, shade: bool = True,
                  specular: bool = False, energy_subtract: bool = False):
    """The fully-unrolled masked bounce loop shared by both kernel
    layouts; returns accumulators + the final (frozen-on-death) direction
    (see _render_kernel for the rationale and semantics notes).

    ``shade=False`` skips the lighting evaluation (and its shadow traces)
    entirely: the contrib/sky_w/direction chain is unchanged — lighting
    never feeds it — so the returned sky_w/count/d match the shaded chain
    bit-for-bit while costing only the nearest-hit traces. Used by the
    textured path's dedicated sky-weight kernel.

    ``energy_subtract`` selects the reference's roadmap mixing model
    (TerminalRayTracer.c:24-28): the hit's local shading is weighted by
    contribution * (1 - reflectivity) and the caller must skip the
    contribution-total normalization (the returned ``total`` is
    unchanged — only the pr/pg/pb weighting differs; sky_w/count/d stay
    bit-identical to the parity chain)."""
    zero = jnp.zeros_like(dx)
    pr, pg, pb = zero, zero, zero
    contrib = jnp.where(lane_valid, 1.0, 0.0).astype(dx.dtype)
    total = zero
    sky_w = zero
    count = jnp.zeros(lane_valid.shape, jnp.int32)

    for _b in range(bounce_limit):
        alive = contrib > constants.CONTRIBUTION_EPS
        hit = _trace(ox, oy, oz, dx, dy, dz, sph_vals, plane_vals,
                     want_spec=specular)
        miss_now = alive & ~hit.is_hit
        upd = alive & hit.is_hit

        aw = jnp.where(alive, contrib, 0.0)
        if shade:
            lr, lg, lb = _apply_lighting(
                hit.px, hit.py, hit.pz, hit.nx, hit.ny, hit.nz,
                hit.cr, hit.cg, hit.cb, dl_vals, pl_vals, sph_vals,
                plane_vals,
                view=(-dx, -dy, -dz) if specular else None,
                mspec=hit.spec if specular else None,
            )
            if energy_subtract:
                hw = jnp.where(hit.is_hit, aw * (1.0 - hit.refl), 0.0)
            else:
                hw = jnp.where(hit.is_hit, aw, 0.0)
            pr = pr + hw * lr
            pg = pg + hw * lg
            pb = pb + hw * lb
        total = total + aw
        sky_w = jnp.where(miss_now, contrib, sky_w)
        contrib = jnp.where(
            alive, jnp.where(upd, contrib * hit.refl, 0.0), contrib
        )

        dn = 2.0 * (dx * hit.nx + dy * hit.ny + dz * hit.nz)
        rdx, rdy, rdz = _normalize3(
            dx - dn * hit.nx, dy - dn * hit.ny, dz - dn * hit.nz
        )
        dx = jnp.where(upd, rdx, dx)
        dy = jnp.where(upd, rdy, dy)
        dz = jnp.where(upd, rdz, dz)
        ox = jnp.where(upd, hit.px, ox)
        oy = jnp.where(upd, hit.py, oy)
        oz = jnp.where(upd, hit.pz, oz)

        # pack bounces | hits<<5: per-lane counts are <= bounce_limit
        # (<= 16), so 5-bit fields suffice — the upper 22 bits stay free
        # for the textured path to carry the sky texel index in the SAME
        # output stream (every extra pallas output stream measurably
        # slows the whole launch)
        count = count + alive.astype(jnp.int32) + (
            upd.astype(jnp.int32) << 5
        )
    return pr, pg, pb, total, sky_w, count, dx, dy, dz


def _gen_primary_rays(cam_ref, *, cfg: RenderConfig, tile_r: int,
                      n_rows: int, n_samples: int):
    """Ray generation from the lane index (TerminalRayTracer.c:978-1011):
    returns (ox, oy, oz, dx, dy, dz, lane_valid) for this grid step's
    (tile_r, LANES) tile. Shared by the render kernel and the textured
    path's sky-weight kernel — both MUST see bit-identical rays."""
    W, H, N = cfg.width, cfg.height, cfg.rays_per_pixel
    n_rays = W * n_rows * n_samples

    step = pl.program_id(0)
    base = step * (tile_r * LANES)
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_r, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (tile_r, LANES), 1)
    )
    idx = base + lane
    # padding lanes (flat index beyond the ray batch) start dead: they do no
    # work in the bounce loop and never pollute the trace count.
    lane_valid = idx < n_rays
    # SAMPLE-MAJOR ray order: idx = k * (W*n_rows) + pixel. The per-pixel
    # AA average then reduces over axis 0 of a (N, rows, W) view —
    # contiguous adds — instead of a minor-dim reduction that costs a full
    # relayout. row_start/n_rows select a horizontal band and
    # cam_ref[16]/n_samples an AA-sample slice (multi-chip sharding
    # renders one band x slice per device).
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

    # triangle-wave AA jitter (TerminalRayTracer.c:225-228, 992-993)
    def tri(t):
        m = jnp.mod(t, 2.0 * constants.PI)
        return jnp.where(
            m < constants.PI, m / constants.PI, 2.0 - m / constants.PI
        )

    jit_x = tri(2.0 * constants.PI * k / N) / 2.0 * pixel_w
    jit_y = tri(constants.PI * k / N) / 2.0 * pixel_h
    sxv = (col / W) * sw - sw / 2.0 + jit_x
    syv = -((row / H) * sh - sh / 2.0) + jit_y

    # reference quirk: direction = screen offset in basis - camera ORIGIN
    # (TerminalRayTracer.c:1005)
    dx, dy, dz = _normalize3(
        sxv * bx0 + syv * by0 + szc * bz0 - cox,
        sxv * bx1 + syv * by1 + szc * bz1 - coy,
        sxv * bx2 + syv * by2 + szc * bz2 - coz,
    )
    ox = jnp.full_like(dx, cox)
    oy = jnp.full_like(dx, coy)
    oz = jnp.full_like(dx, coz)
    return ox, oy, oz, dx, dy, dz, lane_valid


def _sky_weight_kernel(
    cam_ref, sph_ref, plane_ref, dl_ref, pl_ref,  # SMEM scene scalars
    sky_w_ref,  # VMEM output: per-ray sky weight
    *,
    cfg: RenderConfig,
    n_spheres: int,
    n_dl: int,
    n_pl: int,
    tile_r: int,
    n_rows: int,
    n_samples: int,
):
    """Trace-only companion kernel for the ghost (decoy-sky) textured
    variant: replays the exact bounce chain of _render_kernel with
    shading skipped (shade=False drops _apply_lighting and its shadow
    traces — none of it feeds the contrib chain) and writes ONLY the
    per-ray sky weight, bit-identical to the shaded chain's. Measured
    ~1.0 ms at the bench workload vs ~2.2 for the shaded kernel. Part of
    the off-by-default cliff insurance — see render_frame_pallas."""
    ox, oy, oz, dx, dy, dz, lane_valid = _gen_primary_rays(
        cam_ref, cfg=cfg, tile_r=tile_r, n_rows=n_rows, n_samples=n_samples
    )
    sph_vals = _read_tuples(sph_ref, n_spheres, 9)
    plane_vals = tuple(plane_ref[i] for i in range(16))
    dl_vals = _read_tuples(dl_ref, n_dl, 6)
    pl_vals = _read_tuples(pl_ref, n_pl, 7)
    (_, _, _, _, sky_w, _, _, _, _) = _bounce_chain(
        ox, oy, oz, dx, dy, dz, lane_valid,
        sph_vals, plane_vals, dl_vals, pl_vals, cfg.bounce_limit,
        shade=False,
    )
    sky_w_ref[0] = sky_w


def _render_kernel(
    cam_ref, sph_ref, plane_ref, dl_ref, pl_ref,  # SMEM scene scalars
    pix_r_ref, pix_g_ref, pix_b_ref, total_ref, count_ref,  # VMEM outputs
    sky_w_ref=None,  # VMEM output (textured path only)
    wu_ref=None, wv_ref=None,  # VMEM outputs (textured bilinear only)
    *,
    cfg: RenderConfig,
    n_spheres: int,
    n_dl: int,
    n_pl: int,
    sky_dim: int,
    tile_r: int,
    procedural: str = None,
    ghost: str = None,
    n_rows: int = None,
    n_samples: int = None,
):
    W, H, N = cfg.width, cfg.height, cfg.rays_per_pixel
    if n_rows is None:
        n_rows = H
    if n_samples is None:
        n_samples = N  # local AA-sample slice (multi-chip sample sharding)

    ox, oy, oz, dx, dy, dz, lane_valid = _gen_primary_rays(
        cam_ref, cfg=cfg, tile_r=tile_r, n_rows=n_rows, n_samples=n_samples
    )

    sph_vals = _read_tuples(sph_ref, n_spheres, 9)
    plane_vals = tuple(plane_ref[i] for i in range(16))
    dl_vals = _read_tuples(dl_ref, n_dl, 6)
    pl_vals = _read_tuples(pl_ref, n_pl, 7)
    # --- masked bounce loop (project_scene, TerminalRayTracer.c:1012-1057)
    #
    # The loop is FULLY UNROLLED as straight-line SSA code — no
    # lax.while_loop, no fori_loop, no scratch state. Measured on v5e:
    # the identical math runs at 13.7 ms/frame inside a Mosaic loop (any
    # variant tried: while with fat carry, fori with minimal carry,
    # fori + VMEM-scratch state + pl.when early-skip) but 3.3 ms/frame
    # unrolled — Mosaic materializes loop-carried vectors through memory
    # with poor scheduling, while the unrolled form lets it register-
    # allocate and pipeline the whole bounce chain. bounce_limit is a
    # static config, so the unroll factor is fixed at trace time (compile
    # cost ~2 min at depth 10 on the remote compiler, cached thereafter).
    #
    # Lane-state tricks (identical semantics to the jnp oracle):
    #   - aliveness is encoded IN `contrib`: a ray that misses records its
    #     weight in sky_w and zeroes contrib, so alive == contrib > eps —
    #     exactly the oracle's `still_going && contrib > eps`;
    #   - the sky direction needs no extra state: o/d are FROZEN on the
    #     death iteration, so the final d IS the sky direction for
    #     sky-terminated lanes (reflectivity-cutoff lanes have sky_w == 0,
    #     so their garbage-but-in-range texel index is weighted by zero);
    #   - per-lane trace counters pack bounces | hits<<5 (summed host-side
    #     into the honest Mrays/s counter).
    (pr, pg, pb, total, sky_w, count, dx, dy, dz) = _bounce_chain(
        ox, oy, oz, dx, dy, dz, lane_valid,
        sph_vals, plane_vals, dl_vals, pl_vals, cfg.bounce_limit,
        specular=cfg.specular,
        energy_subtract=cfg.energy_model == "subtract",
    )

    if procedural is not None:
        # gather-free path: evaluate the cubemap pattern in-kernel and fold
        # the sky contribution straight into the pixel accumulators
        # (bilinear extension: same pattern replay, 4 taps + 2 lerps)
        sky_eval = (_sky_color_procedural_bilinear if cfg.skybox_bilinear
                    else _sky_color_procedural)
        skr, skg, skb = sky_eval(dx, dy, dz, sky_dim, procedural)
        pr = pr + sky_w * skr
        pg = pg + sky_w * skg
        pb = pb + sky_w * skb
    elif ghost is not None:
        # DECOY-SKY textured variant (insurance, off by default — see
        # render_frame_pallas): folds a REAL decoy procedural sky
        # ('colors' — texel values exactly 0.0/1.0) into the accumulators
        # and does NOT write sky_w (a separate lighting-free kernel,
        # _sky_weight_kernel, re-traces the bounce chain for it); the XLA
        # epilogue cancels the decoy, recomputed bit-exactly from the
        # counter-stream texel index (face = idx // dim^2, face-color
        # table), applying pr + sky_w*(texel - decoy). Cancellation error
        # is <= 1-2 ulp of the pre-quantization color (the same class as
        # compiler FMA-contraction drift, within the quantized-parity
        # knife tolerance). Built while chasing round-2's "Mosaic
        # scheduling cliff"; the 2026-08-17 re-measurement showed the
        # plain textured kernel has compiled fast since the texel index
        # moved into the counter stream, so this path now serves only as
        # a guard if a future toolchain regresses the plain shape.
        skr, skg, skb = _sky_color_procedural(dx, dy, dz, sky_dim, ghost)
        pr = pr + sky_w * skr
        pg = pg + sky_w * skg
        pb = pb + sky_w * skb
    pix_r_ref[0] = pr
    pix_g_ref[0] = pg
    pix_b_ref[0] = pb
    total_ref[0] = total
    if procedural is None:
        # the sky texel index rides the counter stream (bits 10..28; the
        # 5|5-bit trace counts use bits 0..9): one fewer output stream.
        # The bilinear extension carries the floor-based LOW-CORNER tap
        # in the same bits plus its two fractional weights as extra f32
        # streams (the 3 neighbor taps derive from idx00 in the XLA
        # epilogue) — see _sky_texel_index_bilinear.
        if cfg.skybox_bilinear:
            assert ghost is None, "ghost decoy sky is nearest-tap only"
            idx00, wu, wv = _sky_texel_index_bilinear(dx, dy, dz, sky_dim)
            count_ref[0] = count | (idx00 << 10)
            wu_ref[0] = wu
            wv_ref[0] = wv
        else:
            count_ref[0] = count | (
                _sky_texel_index(dx, dy, dz, sky_dim) << 10
            )
        if ghost is None:
            sky_w_ref[0] = sky_w
    else:
        count_ref[0] = count


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_spheres", "n_dl", "n_pl", "sky_dim",
                              "interpret", "tile_r", "procedural", "ghost",
                              "accumulate", "n_rows", "n_samples")
)
def _render_rays_pallas(
    packed: PackedScene,
    skybox_flat: jnp.ndarray,
    cfg: RenderConfig,
    n_spheres: int,
    n_dl: int,
    n_pl: int,
    sky_dim: int,
    interpret: bool = False,
    tile_r: int = TILE_R,
    procedural: str = None,
    ghost: str = None,
    accumulate: bool = False,
    n_rows: int = None,
    n_samples: int = None,
):
    W, H, N = cfg.width, cfg.height, cfg.rays_per_pixel
    if n_rows is None:
        n_rows = H
    if n_samples is None:
        n_samples = N
    ghost = ghost if procedural is None else None
    if ghost is not None and ghost != "colors":
        # the epilogue cancellation recomputes the decoy from the texel
        # index's FACE alone, which only the 'colors' pattern allows
        raise ConfigError(f"ghost decoy sky must be 'colors', got {ghost!r}")
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    def count_to_rays(stats):
        # unpack per-lane counters (bounces | hits<<5; the textured path
        # carries the sky texel index above bit 10, masked off here):
        # traces = bounces + hits * n_lights
        bounces = (stats & 0x1F).astype(jnp.uint32)
        hits = ((stats >> 5) & 0x1F).astype(jnp.uint32)
        n_lights = jnp.uint32(n_dl + n_pl)
        return (bounces + hits * n_lights).sum(dtype=jnp.uint32)

    if procedural is not None and accumulate:
        # EXPERIMENTAL sample-accumulating layout: grid (pixel tiles, spp)
        # with the output block revisited across the sample dimension.
        # Measured 15x SLOWER than the sample-rate layout on v5e (the
        # revisited accumulator stalls Mosaic's grid pipeline) — kept for
        # future investigation, off by default.
        n_pixels = W * H
        n_ptiles = pl.cdiv(n_pixels, tile_r * LANES)
        kernel = functools.partial(
            _render_kernel_acc,
            cfg=cfg, n_spheres=n_spheres, n_dl=n_dl, n_pl=n_pl,
            sky_dim=sky_dim, tile_r=tile_r, procedural=procedural,
        )
        acc_out = lambda dt: (
            jax.ShapeDtypeStruct((n_ptiles, tile_r, LANES), dt),
            pl.BlockSpec((1, tile_r, LANES), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        shapes_specs = [
            acc_out(jnp.float32),  # pixel r (sum over samples)
            acc_out(jnp.float32),  # pixel g
            acc_out(jnp.float32),  # pixel b
            acc_out(jnp.int32),  # packed trace counters (sum over samples)
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(n_ptiles, N),
            out_shape=[sp[0] for sp in shapes_specs],
            in_specs=[smem() for _ in range(5)],
            out_specs=[sp[1] for sp in shapes_specs],
            interpret=interpret,
        )(packed.cam, packed.spheres, packed.plane, packed.dlights,
          packed.plights)
        pr, pg, pb, counts = outs

        def pflat(a):
            return a.reshape(-1)[:n_pixels]

        inv_n = jnp.float32(1.0 / N)
        color = Vec3(
            pflat(pr) * inv_n, pflat(pg) * inv_n, pflat(pb) * inv_n
        )
        # the acc layout repacked per-sample counters into 16|16 sums
        st = pflat(counts)
        bounces = (st & 0xFFFF).astype(jnp.uint32)
        hits = ((st >> 16) & 0xFFFF).astype(jnp.uint32)
        return color, (
            bounces + hits * jnp.uint32(n_dl + n_pl)
        ).sum(dtype=jnp.uint32)

    n_rays = W * n_rows * n_samples
    n_tiles = pl.cdiv(n_rays, tile_r * LANES)

    kernel = functools.partial(
        _render_kernel,
        cfg=cfg,
        n_spheres=n_spheres,
        n_dl=n_dl,
        n_pl=n_pl,
        sky_dim=sky_dim,
        tile_r=tile_r,
        procedural=procedural,
        ghost=ghost if procedural is None else None,
        n_rows=n_rows,
        n_samples=n_samples,
    )

    tile_out = lambda dt: (
        jax.ShapeDtypeStruct((n_tiles, tile_r, LANES), dt),
        pl.BlockSpec((1, tile_r, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    shapes_specs = [
        tile_out(jnp.float32),  # pix_r
        tile_out(jnp.float32),  # pix_g
        tile_out(jnp.float32),  # pix_b
        tile_out(jnp.float32),  # total
        tile_out(jnp.int32),  # packed per-lane trace counters
    ]
    if procedural is None and ghost is None:
        # NOTE: the sky texel index shares the counter stream (bits
        # 10..28) — every extra pallas output stream measurably slows
        # the launch, so the textured path adds only sky_w (and the
        # production ghost path moves even that to a second kernel)
        shapes_specs += [
            tile_out(jnp.float32),  # sky_w
        ]
        if cfg.skybox_bilinear:
            shapes_specs += [
                tile_out(jnp.float32),  # wu (bilinear u fraction)
                tile_out(jnp.float32),  # wv (bilinear v fraction)
            ]
    out_shape = [s for s, _ in shapes_specs]
    out_specs = [sp for _, sp in shapes_specs]

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=out_shape,
        in_specs=[smem() for _ in range(5)],
        out_specs=out_specs,
        interpret=interpret,
    )(packed.cam, packed.spheres, packed.plane, packed.dlights,
      packed.plights)

    # The epilogue runs on the PADDED flat shape (n_tiles * tile_r * 128,
    # a multiple of every vreg tile) and slices to n_rays exactly ONCE at
    # the end — an early [:n_rays] slice leaves every downstream op on a
    # sublane-misaligned array. (Candidate explanation for the textured
    # tier's ~2.5x gap vs the procedural kernel; measurement is
    # inconclusive at the chip's run-to-run variance, but aligned shapes
    # are strictly safer.) Padding lanes start dead in the kernel (zero
    # counters/weights/colors, total == 0 guarded below), so they flow
    # through harmlessly and are cut by the final slice.
    def flat(a):
        return a.reshape(-1)

    if procedural is None:
        if ghost is not None:
            pr, pg, pb, total, counts = outs
            # sky_w comes from the dedicated lighting-free trace kernel
            # (see _sky_weight_kernel for why it is split out)
            sky_w = pl.pallas_call(
                functools.partial(
                    _sky_weight_kernel,
                    cfg=cfg, n_spheres=n_spheres, n_dl=n_dl, n_pl=n_pl,
                    tile_r=tile_r, n_rows=n_rows, n_samples=n_samples,
                ),
                grid=(n_tiles,),
                out_shape=tile_out(jnp.float32)[0],
                in_specs=[smem() for _ in range(5)],
                out_specs=tile_out(jnp.float32)[1],
                interpret=interpret,
            )(packed.cam, packed.spheres, packed.plane, packed.dlights,
              packed.plights)
        elif cfg.skybox_bilinear:
            pr, pg, pb, total, counts, sky_w, wu_t, wv_t = outs
        else:
            pr, pg, pb, total, counts, sky_w = outs
        # deferred skybox fetch + final normalization (texels are packed
        # 0x00RRGGBB so each ray needs ONE 4-byte texel); the index is
        # unpacked from the counter stream
        idx = flat(counts) >> 10
        c255 = jnp.asarray(255.0, jnp.float32)
        if cfg.skybox_bilinear:
            # 4-tap bilinear: idx is the low-corner tap (floor-based, see
            # _sky_texel_index_bilinear); shared epilogue helper — the
            # lerp order is a bit-exactness contract with sample_skybox.
            # Cost = 4x the measured per-fetch gather bound; the
            # refusal-vs-serve decision is in render_frame_pallas's
            # design note.
            from ttrt.render.skybox import bilinear_from_low_tap

            skr, skg, skb = bilinear_from_low_tap(
                skybox_flat, idx, flat(wu_t), flat(wv_t), sky_dim
            )
        else:
            texel = fetch_packed_texels(skybox_flat, idx)
            skr = ((texel >> 16) & 0xFF).astype(jnp.float32) / c255
            skg = ((texel >> 8) & 0xFF).astype(jnp.float32) / c255
            skb = (texel & 0xFF).astype(jnp.float32) / c255
        if ghost is not None:
            # cancel the kernel's decoy 'colors' fold: recompute the decoy
            # value from the texel index's face (bit-exact — decoy texels
            # are exactly 0.0/1.0 per face) and apply pr + w*(texel-decoy)
            face = (idx // (sky_dim * sky_dim)).astype(jnp.int32)

            def face_sel(col):
                out = jnp.full(idx.shape, float(col[0]), jnp.float32)
                for f in range(1, 6):
                    out = jnp.where(face == f, float(col[f]), out)
                return out

            skr = skr - face_sel([c[0] for c in _FACE_COLORS01])
            skg = skg - face_sel([c[1] for c in _FACE_COLORS01])
            skb = skb - face_sel([c[2] for c in _FACE_COLORS01])

        w = flat(sky_w)
        if cfg.energy_model == "subtract":
            inv_total = 1.0  # subtract-model weights partition unity
        else:
            total_f = flat(total)
            inv_total = 1.0 / jnp.where(total_f > 0.0, total_f, 1.0)
        color = Vec3(
            ((flat(pr) + w * skr) * inv_total)[:n_rays],
            ((flat(pg) + w * skg) * inv_total)[:n_rays],
            ((flat(pb) + w * skb) * inv_total)[:n_rays],
        )
    else:
        # procedural skybox: the kernel already folded the sky color in
        pr, pg, pb, total, counts = outs
        if cfg.energy_model == "subtract":
            inv_total = 1.0  # subtract-model weights partition unity
        else:
            total_f = flat(total)
            inv_total = 1.0 / jnp.where(total_f > 0.0, total_f, 1.0)
        color = Vec3(
            (flat(pr) * inv_total)[:n_rays],
            (flat(pg) * inv_total)[:n_rays],
            (flat(pb) * inv_total)[:n_rays],
        )
    return color, count_to_rays(flat(counts))


def render_frame_pallas(
    scene: Scene, cfg: RenderConfig, *, interpret: bool = False,
    tile_r: int = TILE_R, ghost_sky: str = None,
) -> Tuple[Vec3, jnp.ndarray]:
    """Drop-in replacement for ttrt.render.integrator.render_frame on the
    Pallas path: returns the (H, W) framebuffer Vec3 + trace count.

    ``ghost_sky='colors'`` switches the image-cubemap (textured) path to
    the decoy-sky split (fast-shape main kernel + lighting-free sky-weight
    kernel, see _render_kernel / _sky_weight_kernel). Kept as INSURANCE
    against the Mosaic scheduling cliff recurring: measured 2026-08-17,
    the plain textured kernel compiles fast (~2.2 ms at the bench
    workload, same as the ghost main kernel) ever since the sky texel
    index moved into the counter stream, so the split's extra ~1 ms
    sky-weight trace is pure overhead today and the default is None.
    The textured tier's remaining gap vs procedural is ENTIRELY the XLA
    texel gather (~2.4-3 cycles/fetch at 1.34M fetches/frame, invariant
    to row width 8-128, index coherence, index layout, and table size
    down to 6K entries — 7 formulations measured; Mosaic offers no
    arbitrary-index in-kernel gather to beat it). Ignored for procedural
    skyboxes.

    Restrictions vs the fused-XLA path: float32 only; bounce_limit <= 16;
    cubemap dim <= 591. The bilinear extension (reference TODO,
    TerminalRayTracer.c:21-33) is served for BOTH sky kinds: procedural
    in-kernel (gather-free 4-tap pattern replay) and image cubemaps via
    the deferred 4-tap epilogue (see the design note below). The
    Blinn-Phong specular extension (cfg.specular) is served in-kernel,
    mirroring ttrt.render.lighting's math."""
    if cfg.dtype != jnp.float32:
        raise ConfigError("pallas path is float32-only")
    if cfg.skybox_bilinear and scene.skybox.procedural is None and ghost_sky:
        # the ghost split's decoy cancellation is nearest-tap only (it
        # recomputes the decoy from ONE face index); the plain textured
        # kernel serves bilinear, so the combination has no user
        raise ConfigError("ghost decoy sky does not serve --bilinear")
    # Bilinear IMAGE cubemaps (the reference's in-file TODO,
    # TerminalRayTracer.c:21-33) are served by the DEFERRED 4-tap path:
    # the kernel emits the floor-based low-corner texel index in the
    # counter stream plus two fractional-weight f32 streams, and the XLA
    # epilogue derives the clamped neighbors, gathers 4 texels, and lerps
    # in the oracle's exact op order (_sky_texel_index_bilinear). Round-3
    # measurement put the textured tier's bound AT the epilogue gather
    # (~2.4-3 cycles/fetch, invariant to layout/coherence/table size), so
    # 4 taps land near 4x that bound — still far ahead of demoting the
    # WHOLE frame to the XLA integrator (0.57 Gray/s vs ~1.0 textured).
    # PROCEDURAL skies serve bilinear gather-free in-kernel
    # (_sky_color_procedural_bilinear).
    if cfg.bounce_limit > 16:
        # the bounce chain is fully unrolled; keep compile time/program
        # size bounded (the XLA path serves deeper recursions)
        raise ConfigError("pallas path supports bounce_limit <= 16")
    if (
        scene.skybox.procedural is None
        and 6 * scene.skybox.dim * scene.skybox.dim > (2**31 - 1) >> 10
    ):
        # the deferred sky texel index rides bits 10..30 of the int32
        # counter stream; 6*dim^2 << 10 must not overflow into the sign
        # bit (dim >= 592 would yield negative indices after >> 10)
        raise ConfigError(
            "pallas textured path supports cubemap dim <= 591 "
            f"(got {scene.skybox.dim}); use the XLA path for larger skyboxes"
        )
    packed = pack_scene(scene, jnp.float32)
    pixel_rate = False  # the accumulating layout is experimental/off
    color, count = _render_rays_pallas(
        packed,
        scene.skybox.packed.reshape(-1),
        cfg,
        scene.spheres.count,
        scene.directional_lights.count,
        scene.point_lights.count,
        scene.skybox.dim,
        interpret,
        tile_r,
        scene.skybox.procedural,
        ghost=ghost_sky,
    )
    H, W, N = cfg.height, cfg.width, cfg.rays_per_pixel

    if pixel_rate:
        # accumulating kernel already averaged samples in place
        return Vec3(
            color.x.reshape(H, W), color.y.reshape(H, W),
            color.z.reshape(H, W),
        ), count

    def avg(c):
        # sample-major layout: contiguous axis-0 reduction (no relayout)
        return c.reshape(N, H, W).sum(axis=0) * (1.0 / N)

    return Vec3(avg(color.x), avg(color.y), avg(color.z)), count


def render_band_pallas(
    scene: Scene, cfg: RenderConfig, row_offset, n_rows: int, *,
    sample_offset=0.0, n_samples: int = None,
    interpret: bool = False, tile_r: int = TILE_R, reduce: str = "avg",
    ghost_sky: str = None,
) -> Tuple[Vec3, jnp.ndarray]:
    """Render a horizontal band of ``n_rows`` image rows starting at
    ``row_offset`` and the AA-sample slice [sample_offset,
    sample_offset + n_samples) (offsets may be TRACED — e.g.
    lax.axis_index under shard_map, where each device renders its own
    band x slice). Returns the (n_rows, W) framebuffer Vec3 + trace
    count; ``reduce='sum'`` returns the raw per-pixel sample SUM (the
    sharded caller psums slices across chips before dividing by the
    global sample count)."""
    if cfg.dtype != jnp.float32:
        raise ConfigError("pallas path is float32-only")
    W, N = cfg.width, cfg.rays_per_pixel
    if n_samples is None:
        n_samples = N
    packed = pack_scene(
        scene, jnp.float32, row_offset=row_offset,
        sample_offset=sample_offset,
    )
    color, count = _render_rays_pallas(
        packed,
        scene.skybox.packed.reshape(-1),
        cfg,
        scene.spheres.count,
        scene.directional_lights.count,
        scene.point_lights.count,
        scene.skybox.dim,
        interpret,
        tile_r,
        scene.skybox.procedural,
        ghost=ghost_sky,
        accumulate=False,
        n_rows=n_rows,
        n_samples=n_samples,
    )

    scale = 1.0 / N if reduce == "avg" else 1.0

    def red(c):
        return c.reshape(n_samples, n_rows, W).sum(axis=0) * scale

    return Vec3(red(color.x), red(color.y), red(color.z)), count
