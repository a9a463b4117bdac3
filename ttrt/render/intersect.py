"""Ray-scene intersection: batched primitive tests + nearest-hit traversal.

The reference traces one ray at a time through a serial object scan
(trace_ray, TerminalRayTracer.c:793-889). Here a whole flat batch of rays
(every lane of the VPU) is tested against every object at once: the object
scan becomes a running elementwise minimum over the ray batch, with masked
`where`-selects replacing the reference's divergent branches. Small object
counts unroll as a Python loop (fully fused by XLA); large counts run a
`lax.scan` over fixed-size sphere chunks so memory stays O(rays), which is
the path the many-object tier builds on.

Behavioral parity notes (each mirrors a quirk of the reference):
  - sphere hit iff discriminant >= 0 AND nearer root t0 > 0
    (TerminalRayTracer.c:650-671); no max-t; the FAR root is never used.
  - plane hit iff |denom| > 1e-5 and t > 1e-5 (TerminalRayTracer.c:680,685).
  - nearest selection compares SQUARED distance from the ray origin,
    computed as dot(o - p, o - p) (TerminalRayTracer.c:809-816), strictly
    less-than, objects scanned spheres-then-ground.
  - checker parity: ((int)(floor(x) + floor(z))) & 1
    (TerminalRayTracer.c:850) — two's-complement & on possibly negative ints.
  - on hit, the intersection point is pushed EPSILON back toward the ray
    origin with a GUARDED normalize (TerminalRayTracer.c:870-874).
  - on miss, point = ray origin, normal = ray direction, material = skybox
    color with reflectivity/specularity 0 (TerminalRayTracer.c:858-867).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ttrt.config import constants
from ttrt.render.skybox import sample_skybox
from ttrt.scene import (
    HIT_GROUND,
    HIT_NONE,
    HIT_SPHERE,
    Materials,
    Plane,
    Scene,
    Spheres,
)
from ttrt.vec import Vec3

_UNROLL_LIMIT = 16  # static sphere counts up to this unroll as Python loops
_CHUNK = 8  # scan chunk size for large sphere counts


class Hit(NamedTuple):
    """Per-ray nearest-hit record (outputs of trace_ray,
    TerminalRayTracer.c:793)."""

    kind: jnp.ndarray  # int32: HIT_NONE / HIT_SPHERE / HIT_GROUND
    point: Vec3  # intersection (EPSILON-offset on hits)
    normal: Vec3  # guarded-normalized
    material: Materials  # per-ray material (sky material on miss)


def ray_sphere_t0(o: Vec3, d: Vec3, center: Vec3, radius) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearer quadratic root and hit mask (TerminalRayTracer.c:638-672).

    Returns (t0, hit). t0 is garbage where ``hit`` is False (NaN-safe: the
    sqrt argument is clamped before use, selection happens via the mask).
    """
    oc = o - center
    a = d.dot(d)
    b = 2.0 * oc.dot(d)
    c = oc.dot(oc) - radius * radius
    disc = b * b - 4.0 * a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sqrt_disc) / (2.0 * a)
    hit = (disc >= 0.0) & (t0 > 0.0)
    return t0, hit


def ray_plane_t(o: Vec3, d: Vec3, plane_point: Vec3, plane_normal: Vec3):
    """Plane intersection t and hit mask (TerminalRayTracer.c:677-695):
    reject |denom| <= 1e-5 and t <= 1e-5."""
    denom = d.dot(plane_normal)
    safe_denom = jnp.where(denom == 0.0, 1.0, denom)
    to_plane = plane_point - o
    t = to_plane.dot(plane_normal) / safe_denom
    hit = (jnp.abs(denom) > constants.PLANE_DENOM_EPS) & (
        t > constants.PLANE_T_EPS
    )
    return t, hit


class _Best(NamedTuple):
    sqdist: jnp.ndarray
    kind: jnp.ndarray
    point: Vec3
    normal: Vec3
    color: Vec3
    reflectivity: jnp.ndarray
    specularity: jnp.ndarray


def _consider(best: _Best, hit, sqdist, kind_val, point, normal, color, refl, spec) -> _Best:
    """Masked running-min update: adopt the candidate where it hits strictly
    closer (TerminalRayTracer.c:816, 840)."""
    take = hit & (sqdist < best.sqdist)
    return _Best(
        sqdist=jnp.where(take, sqdist, best.sqdist),
        kind=jnp.where(take, kind_val, best.kind),
        point=point.where(take, best.point),
        normal=normal.where(take, best.normal),
        color=color.where(take, best.color),
        reflectivity=jnp.where(take, refl, best.reflectivity),
        specularity=jnp.where(take, spec, best.specularity),
    )


def _sphere_candidate(o: Vec3, d: Vec3, center: Vec3, radius):
    t0, hit = ray_sphere_t0(o, d, center, radius)
    point = Vec3(o.x + t0 * d.x, o.y + t0 * d.y, o.z + t0 * d.z)
    to_point = o - point
    sqdist = to_point.dot(to_point)  # TerminalRayTracer.c:809-815
    normal = point - center  # normalized later (TerminalRayTracer.c:878)
    return hit, sqdist, point, normal


def nearest_hit_raw(scene: Scene, o: Vec3, d: Vec3) -> _Best:
    """Scan all scene objects, returning the raw closest-hit record
    (pre- miss-fixup / normalization). Spheres first, then ground — same
    order and tie behavior as TerminalRayTracer.c:804-853."""
    dtype = o.x.dtype
    shape = o.x.shape
    inf = jnp.full(shape, jnp.inf, dtype)
    zero3 = Vec3.full_like(o, 0.0, 0.0, 0.0)
    best = _Best(
        sqdist=inf,
        kind=jnp.zeros(shape, jnp.int32),
        point=zero3,
        normal=zero3,
        color=zero3,
        reflectivity=jnp.zeros(shape, dtype),
        specularity=jnp.zeros(shape, dtype),
    )

    sph = scene.spheres
    n = sph.count
    if n <= _UNROLL_LIMIT:
        for i in range(n):
            center = Vec3(sph.center.x[i], sph.center.y[i], sph.center.z[i])
            hit, sqdist, point, normal = _sphere_candidate(
                o, d, center, sph.radius[i]
            )
            col = Vec3(
                sph.material.color.x[i],
                sph.material.color.y[i],
                sph.material.color.z[i],
            )
            best = _consider(
                best, hit, sqdist, HIT_SPHERE, point, normal,
                Vec3.full_like(o, 0, 0, 0) + col,
                sph.material.reflectivity[i], sph.material.specularity[i],
            )
    else:
        best = _scan_spheres(best, sph, o, d)

    # Ground plane (TerminalRayTracer.c:830-853)
    g = scene.ground
    t, hit = ray_plane_t(o, d, g.point, g.normal)
    point = Vec3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
    to_point = o - point
    sqdist = to_point.dot(to_point)
    # checker parity incl. negatives: (int)(floor(x)+floor(z)) & 1
    parity = (jnp.floor(point.x) + jnp.floor(point.z)).astype(jnp.int32) & 1
    odd = parity == 1
    col = Vec3(
        jnp.where(odd, g.odd_material.color.x, g.even_material.color.x),
        jnp.where(odd, g.odd_material.color.y, g.even_material.color.y),
        jnp.where(odd, g.odd_material.color.z, g.even_material.color.z),
    )
    refl = jnp.where(odd, g.odd_material.reflectivity, g.even_material.reflectivity)
    spec = jnp.where(odd, g.odd_material.specularity, g.even_material.specularity)
    normal = Vec3.full_like(o, 0, 0, 0) + g.normal
    best = _consider(best, hit, sqdist, HIT_GROUND, point, normal, col, refl, spec)
    return best


def _scan_spheres(best: _Best, sph: Spheres, o: Vec3, d: Vec3) -> _Best:
    """lax.scan over fixed-size sphere chunks: O(rays) memory at any sphere
    count. Chunks are padded with an explicit valid mask."""
    n = sph.count
    pad = (-n) % _CHUNK
    def pad1(a):
        return jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) if pad else a

    leaves = jax.tree_util.tree_map(pad1, sph)
    valid = jnp.arange(n + pad) < n
    n_chunks = (n + pad) // _CHUNK

    def reshape(a):
        return a.reshape(n_chunks, _CHUNK)

    chunked = jax.tree_util.tree_map(reshape, leaves)
    valid = valid.reshape(n_chunks, _CHUNK)

    def body(carry, xs):
        best = carry
        chunk, vmask = xs
        for j in range(_CHUNK):
            center = Vec3(chunk.center.x[j], chunk.center.y[j], chunk.center.z[j])
            hit, sqdist, point, normal = _sphere_candidate(
                o, d, center, chunk.radius[j]
            )
            hit = hit & vmask[j]
            col = Vec3(
                chunk.material.color.x[j],
                chunk.material.color.y[j],
                chunk.material.color.z[j],
            )
            best = _consider(
                best, hit, sqdist, HIT_SPHERE, point, normal,
                Vec3.full_like(o, 0, 0, 0) + col,
                chunk.material.reflectivity[j], chunk.material.specularity[j],
            )
        return best, None

    best, _ = jax.lax.scan(body, best, (chunked, valid))
    return best


def trace_ray(scene: Scene, o: Vec3, d: Vec3, *, sample_sky: bool = True,
              bilinear: bool = False) -> Hit:
    """Full trace_ray semantics (TerminalRayTracer.c:793-889) over a ray
    batch: nearest hit, miss fixups + skybox material, EPSILON back-offset,
    guarded normal normalization.

    ``sample_sky=False`` skips the skybox gather (shadow rays never read the
    material — TerminalRayTracer.c:907,937 pass NULL out-params)."""
    best = nearest_hit_raw(scene, o, d)
    miss = best.kind == HIT_NONE

    # Hit path: push the intersection back toward the origin by EPSILON
    # through a guarded normalize (TerminalRayTracer.c:870-874).
    to_origin = (o - best.point).normalize()
    eps = jnp.asarray(constants.EPSILON, o.x.dtype)
    point_hit = Vec3(
        best.point.x + to_origin.x * eps,
        best.point.y + to_origin.y * eps,
        best.point.z + to_origin.z * eps,
    )
    point = o.where(miss, point_hit)  # miss: point = ray origin (c:860)
    normal = d.where(miss, best.normal).normalize()  # miss: ray dir (c:861)

    if sample_sky:
        sky = sample_skybox(scene.skybox, d, bilinear=bilinear)
        color = sky.where(miss, best.color)
    else:
        color = best.color
    refl = jnp.where(miss, 0.0, best.reflectivity)  # c:866 zero-inits
    spec = jnp.where(miss, 0.0, best.specularity)

    return Hit(
        kind=best.kind,
        point=point,
        normal=normal,
        material=Materials(color=color, reflectivity=refl, specularity=spec),
    )


# the demo-tier Scene traces via the linear object scan above
from ttrt.render import dispatch as _dispatch  # noqa: E402

_dispatch.register_trace(Scene, trace_ray)
