"""Dense blocked ray-scene intersection for the many-object tier.

TPU-first finding (measured on v5e): the uniform-grid DDA traversal —
the classic CPU/GPU answer — is pathological under XLA: a long
whole-batch while_loop whose every step performs per-lane gathers runs at
~0.1 Mray/s for 10k spheres. A LOCKSTEP machine wants dense regular
compute: test EVERY (ray, sphere) pair in blocked form.

Per sphere chunk of size CH against all R rays the quadratic terms are
rank-3 contractions:
    C.D  (CH,3)x(3,R)   C.O  (CH,3)x(3,R)
    b = 2(o.d - C.D)    c = o.o - 2 C.O + (|C|^2 - r^2)
followed by ~12 elementwise ops on the (CH,R) pair block and a columnwise
min. The winning object id needs NO gather: chunks are consecutive, so
id = chunk_base + argmin. lax.scan over chunks keeps memory at one
(CH, R) block. ~10000x30000 pairs stream at VPU rate — two orders of
magnitude faster than the gather-bound traversal.

The grid structure (ttrt.mesh.grid) remains available (CPU path, tests,
API parity with the reference's "hierarchy" roadmap item); the dispatcher
picks the dense path on accelerator backends.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.config import constants
from ttrt.mesh.grid import GridHit
from ttrt.mesh.triangles import Triangles
from ttrt.scene import Spheres
from ttrt.vec import Vec3

SPHERE_CHUNK = 512
TRI_CHUNK = 128


def _pad_to(a: jnp.ndarray, m: int, fill=0.0):
    pad = (-a.shape[0]) % m
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
    )


def dense_nearest(
    spheres: Optional[Spheres],
    triangles: Optional[Triangles],
    o: Vec3,
    d: Vec3,
) -> GridHit:
    """Nearest (t, object id) over all spheres + triangles by blocked
    exhaustive testing. Rays with arbitrary (possibly unnormalized)
    directions are supported (the 1/(2a) factor is per-ray)."""
    dtype = o.x.dtype
    R = o.x.shape[0]
    inf = jnp.full((R,), jnp.inf, dtype)
    best_t = inf
    best_obj = jnp.full((R,), -1, jnp.int32)

    a = d.dot(d)  # (R,)
    inv2a = 0.5 / a
    od = o.dot(d)
    oo = o.dot(o)

    n_spheres = spheres.count if spheres is not None else 0
    if n_spheres:
        C = jnp.stack([spheres.center.x, spheres.center.y,
                       spheres.center.z], axis=-1)  # (N,3)
        cc_r2 = (
            spheres.center.x ** 2 + spheres.center.y ** 2
            + spheres.center.z ** 2 - spheres.radius ** 2
        )
        C = _pad_to(C, SPHERE_CHUNK)
        cc_r2 = _pad_to(cc_r2, SPHERE_CHUNK)
        valid = _pad_to(
            jnp.ones((n_spheres,), bool), SPHERE_CHUNK, fill=False
        )
        n_ch = C.shape[0] // SPHERE_CHUNK
        D = jnp.stack([d.x, d.y, d.z])  # (3,R)
        O = jnp.stack([o.x, o.y, o.z])

        def body(carry, xs):
            bt, bo, base = carry
            Cc, ccr2, vld = xs
            # precision=HIGHEST is CORRECTNESS-CRITICAL on TPU: the default
            # lowers f32 dots to one bf16 MXU pass (~4e-3 relative noise),
            # which flips the sign of narrow-hit discriminants for small
            # spheres — measured ~6% FALSE HITS and ~45% wrong winners at
            # the 10k-sphere tier vs the exact VPU-f32 cluster kernel.
            hp = jax.lax.Precision.HIGHEST
            CD = jnp.dot(Cc, D, preferred_element_type=dtype,
                         precision=hp)  # (CH,R)
            CO = jnp.dot(Cc, O, preferred_element_type=dtype, precision=hp)
            b = 2.0 * (od[None, :] - CD)
            c = oo[None, :] - 2.0 * CO + ccr2[:, None]
            disc = b * b - (4.0 * a)[None, :] * c
            hit = (disc >= 0.0) & (b < 0.0) & (c > 0.0) & vld[:, None]
            t0 = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv2a[None, :]
            t0 = jnp.where(hit, t0, jnp.inf)
            cmin = jnp.min(t0, axis=0)
            carg = jnp.argmin(t0, axis=0).astype(jnp.int32)
            take = cmin < bt
            bt = jnp.where(take, cmin, bt)
            bo = jnp.where(take, base + carg, bo)  # consecutive ids: no gather
            return (bt, bo, base + SPHERE_CHUNK), None

        (best_t, best_obj, _), _ = jax.lax.scan(
            body,
            (best_t, best_obj, jnp.int32(0)),
            (
                C.reshape(n_ch, SPHERE_CHUNK, 3),
                cc_r2.reshape(n_ch, SPHERE_CHUNK),
                valid.reshape(n_ch, SPHERE_CHUNK),
            ),
        )

    if triangles is not None and triangles.count:
        M = triangles.count
        pack = jnp.stack(
            [triangles.v0.x, triangles.v0.y, triangles.v0.z,
             triangles.e1.x, triangles.e1.y, triangles.e1.z,
             triangles.e2.x, triangles.e2.y, triangles.e2.z],
            axis=-1,
        )  # (M,9)
        pack = _pad_to(pack, TRI_CHUNK)
        tvalid = _pad_to(jnp.ones((M,), bool), TRI_CHUNK, fill=False)
        n_tch = pack.shape[0] // TRI_CHUNK

        def tbody(carry, xs):
            bt, bo, base = carry
            P, vld = xs  # (CH,9), (CH,)
            v0 = P[:, 0:3]
            e1 = P[:, 3:6]
            e2 = P[:, 6:9]
            # Moller-Trumbore on the (CH, R) pair block
            dxv = jnp.stack([d.x, d.y, d.z], axis=-1)  # (R,3)
            oxv = jnp.stack([o.x, o.y, o.z], axis=-1)

            def cross_dr_e(e):
                # cross(d_r, e_c) -> 3 arrays of (CH,R)
                return (
                    dxv[None, :, 1] * e[:, None, 2]
                    - dxv[None, :, 2] * e[:, None, 1],
                    dxv[None, :, 2] * e[:, None, 0]
                    - dxv[None, :, 0] * e[:, None, 2],
                    dxv[None, :, 0] * e[:, None, 1]
                    - dxv[None, :, 1] * e[:, None, 0],
                )

            px, py, pz = cross_dr_e(e2)
            det = (
                e1[:, None, 0] * px + e1[:, None, 1] * py
                + e1[:, None, 2] * pz
            )
            ok = jnp.abs(det) > constants.PLANE_DENOM_EPS
            inv = 1.0 / jnp.where(ok, det, 1.0)
            sx = oxv[None, :, 0] - v0[:, None, 0]
            sy = oxv[None, :, 1] - v0[:, None, 1]
            sz = oxv[None, :, 2] - v0[:, None, 2]
            u = (sx * px + sy * py + sz * pz) * inv
            qx = sy * e1[:, None, 2] - sz * e1[:, None, 1]
            qy = sz * e1[:, None, 0] - sx * e1[:, None, 2]
            qz = sx * e1[:, None, 1] - sy * e1[:, None, 0]
            v = (
                dxv[None, :, 0] * qx + dxv[None, :, 1] * qy
                + dxv[None, :, 2] * qz
            ) * inv
            t = (
                e2[:, None, 0] * qx + e2[:, None, 1] * qy
                + e2[:, None, 2] * qz
            ) * inv
            hit = (
                ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > constants.PLANE_T_EPS) & vld[:, None]
            )
            t = jnp.where(hit, t, jnp.inf)
            cmin = jnp.min(t, axis=0)
            carg = jnp.argmin(t, axis=0).astype(jnp.int32)
            take = cmin < bt
            bt = jnp.where(take, cmin, bt)
            bo = jnp.where(take, base + carg, bo)
            return (bt, bo, base + TRI_CHUNK), None

        (best_t, best_obj, _), _ = jax.lax.scan(
            tbody,
            (best_t, best_obj, jnp.int32(n_spheres)),
            (
                pack.reshape(n_tch, TRI_CHUNK, 9),
                tvalid.reshape(n_tch, TRI_CHUNK),
            ),
        )

    hit_ok = jnp.isfinite(best_t)
    return GridHit(
        t=jnp.where(hit_ok, best_t, jnp.inf),
        obj=jnp.where(hit_ok, best_obj, -1),
    )
