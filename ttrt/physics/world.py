"""Rigid-body sphere world: GJK contacts + impulse response, one jittable
step fused with the render loop (BASELINE.json config 5).

Everything is a fixed-shape whole-batch computation:
  - integration is elementwise over the N bodies;
  - collision detection runs ALL i<j pairs through one batched GJK call
    (N<=a few hundred bodies: the pair list is a static upper-triangle
    index set — no broadphase needed at this tier);
  - contact impulses are accumulated back per body with segment-sums
    (masked scatter-add), so simultaneous contacts resolve in one pass;
  - the whole step is pure (state, params, dt) -> state — the pytree IS
    the checkpoint (SURVEY.md §5: scene state must remain serializable by
    construction).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.physics.gjk import gjk_distance, sphere_support, Support
from ttrt.vec import Vec3


class PhysicsParams(NamedTuple):
    """Static world parameters (pytree of arrays; shapes fixed per scene)."""

    radius: jnp.ndarray  # (N,)
    inv_mass: jnp.ndarray  # (N,) 0 = static body
    gravity: jnp.ndarray  # (3,)
    restitution: jnp.ndarray  # scalar
    ground_y: jnp.ndarray  # scalar: floor plane height
    bounds: jnp.ndarray  # scalar: |x|,|z| soft wall (keeps the demo on screen)
    # optional STATIC convex obstacles as vertex hulls (B, V, 3): spheres
    # collide with them through the general GJK query (sphere margin vs
    # polytope support) — boxes, ramps, any convex hull
    obstacles: Optional[jnp.ndarray] = None


class PhysicsState(NamedTuple):
    """Dynamic state — the checkpointable pytree."""

    pos: Vec3  # (N,)
    vel: Vec3  # (N,)
    t: jnp.ndarray  # sim time


def default_params(radii, dtype=jnp.float32, ground_y=-2.0,
                   restitution=0.85, bounds=6.0,
                   obstacles=None) -> PhysicsParams:
    radii = jnp.asarray(radii, dtype)
    # mass ~ volume
    inv_mass = 1.0 / (radii ** 3 / jnp.max(radii) ** 3)
    return PhysicsParams(
        radius=radii,
        inv_mass=inv_mass.astype(dtype),
        gravity=jnp.asarray([0.0, -9.81, 0.0], dtype),
        restitution=jnp.asarray(restitution, dtype),
        ground_y=jnp.asarray(ground_y, dtype),
        bounds=jnp.asarray(bounds, dtype),
        obstacles=(
            None if obstacles is None else jnp.asarray(obstacles, dtype)
        ),
    )


def box_obstacle(center, half_extents, dtype=jnp.float32) -> np.ndarray:
    """(1, 8, 3) vertex hull for an axis-aligned box obstacle."""
    c = np.asarray(center, np.float64)
    h = np.asarray(half_extents, np.float64)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    )
    return (c + corners * h)[None].astype(np.float32)


def _pair_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    iu = np.triu_indices(n, k=1)
    return iu[0].astype(np.int32), iu[1].astype(np.int32)


def physics_step(
    state: PhysicsState, params: PhysicsParams, dt, substeps: int = 1
) -> PhysicsState:
    """Advance the world by dt: semi-implicit Euler + GJK contacts +
    impulse response + positional de-penetration + ground/bounds bounce."""
    n = params.radius.shape[0]
    ii_np, jj_np = _pair_indices(n)
    has_pairs = ii_np.size > 0  # static: resolved at trace time
    ii = jnp.asarray(ii_np)
    jj = jnp.asarray(jj_np)
    dt = jnp.asarray(dt, state.pos.x.dtype)
    h = dt / substeps

    def gather(v: Vec3, idx) -> Vec3:
        return Vec3(jnp.take(v.x, idx), jnp.take(v.y, idx), jnp.take(v.z, idx))

    def substep(s: PhysicsState, _) -> Tuple[PhysicsState, None]:
        gx, gy, gz = params.gravity
        vel = Vec3(
            s.vel.x + gx * h * (params.inv_mass > 0),
            s.vel.y + gy * h * (params.inv_mass > 0),
            s.vel.z + gz * h * (params.inv_mass > 0),
        )
        pos = Vec3(
            s.pos.x + vel.x * h, s.pos.y + vel.y * h, s.pos.z + vel.z * h
        )

        if has_pairs:
            # --- sphere-sphere contacts through the GENERAL GJK query
            pa = gather(pos, ii)
            pb = gather(pos, jj)
            ra = jnp.take(params.radius, ii)
            rb = jnp.take(params.radius, jj)
            sa = sphere_support(pa, ra)
            sb = sphere_support(pb, rb)
            dist, normal = gjk_distance(sa, sb, pa - pb)  # n: B -> A

            pen = jnp.maximum(-dist, 0.0)
            touching = dist < 0.0

            va = gather(vel, ii)
            vb = gather(vel, jj)
            rel = va - vb
            vn = rel.dot(normal)
            approaching = vn < 0.0
            act = touching & approaching

            ima = jnp.take(params.inv_mass, ii)
            imb = jnp.take(params.inv_mass, jj)
            im_sum = jnp.maximum(ima + imb, 1e-12)
            jimp = jnp.where(
                act, -(1.0 + params.restitution) * vn / im_sum, 0.0
            )

            # velocity impulses
            dvax = jimp * ima * normal.x
            dvay = jimp * ima * normal.y
            dvaz = jimp * ima * normal.z
            dvbx = -jimp * imb * normal.x
            dvby = -jimp * imb * normal.y
            dvbz = -jimp * imb * normal.z

            # positional correction (projection, mass-weighted)
            corr = jnp.where(touching, pen / im_sum, 0.0)
            cax = corr * ima * normal.x
            cay = corr * ima * normal.y
            caz = corr * ima * normal.z
            cbx = -corr * imb * normal.x
            cby = -corr * imb * normal.y
            cbz = -corr * imb * normal.z

            def scatter(base, idx_a, val_a, idx_b, val_b):
                return (
                    base.at[idx_a].add(val_a).at[idx_b].add(val_b)
                )

            vel = Vec3(
                scatter(vel.x, ii, dvax, jj, dvbx),
                scatter(vel.y, ii, dvay, jj, dvby),
                scatter(vel.z, ii, dvaz, jj, dvbz),
            )
            pos = Vec3(
                scatter(pos.x, ii, cax, jj, cbx),
                scatter(pos.y, ii, cay, jj, cby),
                scatter(pos.z, ii, caz, jj, cbz),
            )

        if params.obstacles is not None:
            # --- sphere vs static convex obstacles through the GENERAL
            # GJK query (polytope support = argmax-dot over the hull)
            from ttrt.physics.gjk import polytope_support

            B = params.obstacles.shape[0]
            rep = lambda c: jnp.repeat(c, B)
            pa = Vec3(rep(pos.x), rep(pos.y), rep(pos.z))  # (n*B,)
            ra = jnp.repeat(params.radius, B)
            verts = jnp.tile(params.obstacles, (n, 1, 1))  # (n*B, V, 3)
            centers = verts.mean(axis=1)
            guess = Vec3(
                pa.x - centers[:, 0], pa.y - centers[:, 1],
                pa.z - centers[:, 2],
            )
            dist, normal = gjk_distance(
                sphere_support(pa, ra), polytope_support(verts), guess
            )
            pen = jnp.maximum(-dist, 0.0)
            touching = dist < 0.0
            va_ = Vec3(rep(vel.x), rep(vel.y), rep(vel.z))
            vn = va_.dot(normal)
            act = touching & (vn < 0.0)
            ima = jnp.repeat(params.inv_mass, B)
            movable = ima > 0
            dv = jnp.where(act & movable, -(1.0 + params.restitution) * vn,
                           0.0)
            corr = jnp.where(touching & movable, pen, 0.0)

            def acc(v):  # sum contributions over this sphere's B obstacles
                return v.reshape(n, B).sum(axis=1)

            vel = Vec3(
                vel.x + acc(dv * normal.x),
                vel.y + acc(dv * normal.y),
                vel.z + acc(dv * normal.z),
            )
            pos = Vec3(
                pos.x + acc(corr * normal.x),
                pos.y + acc(corr * normal.y),
                pos.z + acc(corr * normal.z),
            )

        # --- ground plane (y = ground_y): clamp + restitution bounce
        floor = params.ground_y + params.radius
        below = pos.y < floor
        pos = Vec3(pos.x, jnp.where(below, floor, pos.y), pos.z)
        vel = Vec3(
            vel.x,
            jnp.where(below & (vel.y < 0), -params.restitution * vel.y, vel.y),
            vel.z,
        )

        # --- soft walls at |x|,|z| = bounds keep the demo in frame
        for axis in ("x", "z"):
            p = getattr(pos, axis)
            v = getattr(vel, axis)
            hi = params.bounds - params.radius
            over = p > hi
            under = p < -hi
            p = jnp.where(over, hi, jnp.where(under, -hi, p))
            v = jnp.where(
                over & (v > 0) | under & (v < 0),
                -params.restitution * v,
                v,
            )
            pos = pos._replace(**{axis: p})
            vel = vel._replace(**{axis: v})

        return PhysicsState(pos=pos, vel=vel, t=s.t + h), None

    out, _ = jax.lax.scan(substep, state, None, length=substeps)
    return out
