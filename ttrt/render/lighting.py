"""Lighting: Lambertian diffuse with shadow rays, per the reference's
apply_lighting (TerminalRayTracer.c:891-963).

Parity quirks preserved exactly:
  - n.l is clamped ABOVE at 1.0 via fmin but NOT below at 0
    (TerminalRayTracer.c:911,945): back-facing lights darken the
    accumulator; the final [0,1] clamp (TerminalRayTracer.c:960) rescues
    the result.
  - directional lights are blocked by ANY hit of the shadow ray
    (TerminalRayTracer.c:907-908) — there is no distance cutoff.
  - point lights: intensity = clamp(I/d^2, 0, 1) (TerminalRayTracer.c:931);
    the occlusion test compares light-distance^2 against the shadow trace's
    returned intersection point EVEN when the trace misses — on a miss that
    point equals the shadow-ray origin (TerminalRayTracer.c:860), so the
    `blocking_object == NONE` arm short-circuits first
    (TerminalRayTracer.c:942). The light is visible when it is strictly
    CLOSER than the blocker.
  - the result overwrites the material color (TerminalRayTracer.c:962).

Blinn-Phong specular exists in the reference only as commented-out code
(TerminalRayTracer.c:913-916, 947-950); we expose it behind
``specular=True`` for the extended tier, default off (= parity).
"""

from __future__ import annotations

import jax.numpy as jnp

from ttrt.render import dispatch
from ttrt.scene import HIT_NONE, Scene
from ttrt.vec import Vec3, clamp


def apply_lighting(
    scene: Scene,
    intersection: Vec3,
    view: Vec3,
    normal: Vec3,
    material_color: Vec3,
    specularity=None,
    *,
    specular: bool = False,
) -> Vec3:
    """Shade a batch of hit points; returns the lit color (the value the
    reference writes back into material->color)."""
    out = Vec3.full_like(intersection, 0.0, 0.0, 0.0)

    dl = scene.directional_lights
    for i in range(dl.count):
        ldir = Vec3(-dl.direction.x[i], -dl.direction.y[i], -dl.direction.z[i])
        ldir = ldir.normalize()
        ldir_b = Vec3.full_like(intersection, 0, 0, 0) + ldir
        shadow = dispatch.trace(scene, intersection, ldir_b, sample_sky=False)
        unblocked = shadow.kind == HIT_NONE
        ndotl = jnp.minimum(normal.dot(ldir_b), 1.0)  # fmin only (c:911)
        lcol = Vec3(dl.color.x[i], dl.color.y[i], dl.color.z[i])
        contrib = Vec3(
            lcol.x * ndotl * material_color.x,
            lcol.y * ndotl * material_color.y,
            lcol.z * ndotl * material_color.z,
        )
        if specular and specularity is not None:
            half = (ldir_b + view).normalize()
            s = jnp.power(
                clamp(normal.dot(half), 0.0, 1.0), specularity
            )
            contrib = Vec3(
                contrib.x + lcol.x * s, contrib.y + lcol.y * s, contrib.z + lcol.z * s
            )
        out = out + contrib.where(unblocked, Vec3.full_like(out, 0, 0, 0))

    pl = scene.point_lights
    for i in range(pl.count):
        lpos = Vec3(pl.position.x[i], pl.position.y[i], pl.position.z[i])
        lvec = Vec3(
            lpos.x - intersection.x, lpos.y - intersection.y, lpos.z - intersection.z
        )
        light_d2 = lvec.dot(lvec)
        intensity = clamp(pl.intensity[i] / light_d2, 0.0, 1.0)  # c:931
        ldir = lvec.normalize()
        shadow = dispatch.trace(scene, intersection, ldir, sample_sky=False)
        # blocker distance^2 from the (EPSILON-offset) shadow hit; on a miss
        # the hit point IS the origin so this is 0 — but the kind==NONE arm
        # wins, matching TerminalRayTracer.c:937-942.
        to_block = shadow.point - intersection
        block_d2 = to_block.dot(to_block)
        lit = (shadow.kind == HIT_NONE) | (light_d2 < block_d2)
        ndotl = jnp.minimum(normal.dot(ldir), 1.0)  # fmin only (c:945)
        scale = intensity * ndotl
        lcol = Vec3(pl.color.x[i], pl.color.y[i], pl.color.z[i])
        contrib = Vec3(
            lcol.x * scale * material_color.x,
            lcol.y * scale * material_color.y,
            lcol.z * scale * material_color.z,
        )
        if specular and specularity is not None:
            half = (ldir + view).normalize()
            s = intensity * jnp.power(
                clamp(normal.dot(half), 0.0, 1.0), specularity
            )
            contrib = Vec3(
                contrib.x + lcol.x * s, contrib.y + lcol.y * s, contrib.z + lcol.z * s
            )
        out = out + contrib.where(lit, Vec3.full_like(out, 0, 0, 0))

    return out.clamp(0.0, 1.0)  # TerminalRayTracer.c:960
