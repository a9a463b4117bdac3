"""Monte-Carlo path tracer: soft shadows from spherical area lights +
cosine-sampled diffuse interreflection (BASELINE.json config 5: "soft
shadows + multi-sample path tracing").

The reference is a Whitted-style tracer (mirror bounces + delta lights,
TerminalRayTracer.c:1012-1057); this module is the stochastic extension
built on the same primitives: dispatch.trace for visibility, the same scene
pytrees, the same deferred-skybox trick. TPU-first structure is identical
to the deterministic integrator — one flat ray batch, fixed-depth masked
bounce loop — plus counter-based RNG: every (lane, bounce, purpose) draws
from jax.random with a fresh fold_in, so the whole frame stays one fused
program with no RNG state threading.

Estimator (per path):
  radiance += throughput * direct_light(hit)      [next-event estimation]
  throughput *= albedo (diffuse) or reflectivity (specular)
  direction  ~ cosine hemisphere (diffuse) or mirror (specular),
               chosen per-lane with probability = material reflectivity
  miss: radiance += throughput * skybox, path ends.

Direct lighting samples ONE point on each spherical light's surface per
bounce; the visibility ray uses the same trace as everything else. The
1/pdf and cosine/pi terms fold into the standard solid-angle-free form for
a uniformly sampled sphere light: L * (area / d^2) * max(n.l, 0) *
max(nl.wi, 0) / pi, with area = 4 pi r^2 absorbed into ``intensity``
scaling chosen to match the reference's point-light look as r -> 0.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ttrt.config import RenderConfig, constants
from ttrt.render import dispatch
from ttrt.render.skybox import sample_skybox
from ttrt.scene import HIT_NONE
from ttrt.vec import Vec3


class AreaLights(NamedTuple):
    """Spherical emitters: SoA over L lights."""

    position: Vec3  # (L,)
    radius: jnp.ndarray  # (L,)
    color: Vec3  # (L,)
    intensity: jnp.ndarray  # (L,)

    @property
    def count(self) -> int:
        return self.intensity.shape[-1]

    @staticmethod
    def create(positions, radii, colors, intensities, dtype=jnp.float32):
        p = jnp.asarray(positions, dtype)
        c = jnp.asarray(colors, dtype)
        return AreaLights(
            position=Vec3.from_array(p),
            radius=jnp.asarray(radii, dtype),
            color=Vec3.from_array(c),
            intensity=jnp.asarray(intensities, dtype),
        )


def _uniform_sphere(key, shape, dtype) -> Vec3:
    """Uniform directions on the unit sphere."""
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, shape, dtype, -1.0, 1.0)
    phi = jax.random.uniform(k2, shape, dtype, 0.0, 2.0 * constants.PI)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def _cosine_hemisphere(key, normal: Vec3, dtype) -> Vec3:
    """Cosine-weighted directions about ``normal`` via the sphere-offset
    trick: normalize(n + uniform_sphere) is exactly cosine-distributed."""
    s = _uniform_sphere(key, normal.x.shape, dtype)
    d = Vec3(normal.x + s.x, normal.y + s.y, normal.z + s.z)
    # degenerate (s == -n): fall back to the normal
    tiny = d.dot(d) < 1e-8
    d = normal.where(tiny, d)
    return d.normalize()


class _PTState(NamedTuple):
    o: Vec3
    d: Vec3
    radiance: Vec3
    throughput: Vec3
    alive: jnp.ndarray
    sky_dir: Vec3
    sky_w: Vec3  # per-channel throughput at sky exit


def _direct_light(
    scene, lights: AreaLights, key, p: Vec3, n: Vec3, albedo: Vec3, dtype
) -> Vec3:
    """Next-event estimation against every area light (one surface sample
    each). Soft shadows arise from the per-sample light-point jitter."""
    out = Vec3.full_like(p, 0.0, 0.0, 0.0)
    for i in range(lights.count):
        ki = jax.random.fold_in(key, i)
        lp = Vec3(lights.position.x[i], lights.position.y[i],
                  lights.position.z[i])
        lr = lights.radius[i]
        s = _uniform_sphere(ki, p.x.shape, dtype)
        lx = Vec3(lp.x + lr * s.x, lp.y + lr * s.y, lp.z + lr * s.z)

        to_l = lx - p
        d2 = to_l.dot(to_l)
        wi = to_l.normalize()
        ndotl = jnp.maximum(n.dot(wi), 0.0)

        shadow = dispatch.trace(scene, p, wi, sample_sky=False)
        blk = shadow.point - p
        blk_d2 = blk.dot(blk)
        visible = (shadow.kind == HIT_NONE) | (blk_d2 >= d2 * (1.0 - 1e-4))

        fall = jnp.minimum(lights.intensity[i] / jnp.maximum(d2, 1e-8), 1.0)
        w = jnp.where(visible, fall * ndotl, 0.0)
        out = Vec3(
            out.x + w * lights.color.x[i] * albedo.x,
            out.y + w * lights.color.y[i] * albedo.y,
            out.z + w * lights.color.z[i] * albedo.z,
        )
    return out


def pathtrace_batch(
    scene,
    lights: AreaLights,
    o: Vec3,
    d: Vec3,
    cfg: RenderConfig,
    key,
) -> Vec3:
    """Trace one stochastic bounce chain for every lane; returns radiance."""
    dtype = cfg.dtype

    def body(b, s: _PTState) -> _PTState:
        kb = jax.random.fold_in(key, b)
        hit = dispatch.trace(scene, s.o, s.d, sample_sky=False)
        is_hit = hit.kind != HIT_NONE
        miss_now = s.alive & ~is_hit

        # record sky exit (deferred gather, same trick as the integrator)
        sky_w = s.throughput.where(miss_now, s.sky_w)
        sky_dir = s.d.where(miss_now, s.sky_dir)

        albedo = hit.material.color
        direct = _direct_light(
            scene, lights, jax.random.fold_in(kb, 1000),
            hit.point, hit.normal, albedo, dtype,
        )
        add = s.alive & is_hit
        radiance = Vec3(
            s.radiance.x + jnp.where(add, s.throughput.x * direct.x, 0.0),
            s.radiance.y + jnp.where(add, s.throughput.y * direct.y, 0.0),
            s.radiance.z + jnp.where(add, s.throughput.z * direct.z, 0.0),
        )

        # branch: specular (prob = reflectivity) vs diffuse
        u = jax.random.uniform(
            jax.random.fold_in(kb, 2000), s.o.x.shape, dtype
        )
        refl = hit.material.reflectivity
        spec = u < refl
        d_spec = s.d.reflect(hit.normal).normalize()
        d_diff = _cosine_hemisphere(
            jax.random.fold_in(kb, 3000), hit.normal, dtype
        )
        nd = d_spec.where(spec, d_diff)

        # throughput: specular keeps color (energy refl already in the
        # branch probability); diffuse multiplies albedo
        tp = Vec3(
            jnp.where(spec, s.throughput.x, s.throughput.x * albedo.x),
            jnp.where(spec, s.throughput.y, s.throughput.y * albedo.y),
            jnp.where(spec, s.throughput.z, s.throughput.z * albedo.z),
        )

        # russian roulette from bounce 3 on the max channel
        maxc = jnp.maximum(tp.x, jnp.maximum(tp.y, tp.z))
        if_rr = b >= 3
        ru = jax.random.uniform(
            jax.random.fold_in(kb, 4000), s.o.x.shape, dtype
        )
        p_cont = jnp.clip(maxc, 0.05, 1.0)
        survive = jnp.where(if_rr, ru < p_cont, True)
        inv_p = jnp.where(if_rr, 1.0 / p_cont, 1.0)
        tp = Vec3(tp.x * inv_p, tp.y * inv_p, tp.z * inv_p)

        alive = s.alive & is_hit & survive
        return _PTState(
            o=hit.point.where(is_hit, s.o),
            d=nd.where(is_hit, s.d),
            radiance=radiance,
            throughput=tp.where(s.alive, s.throughput),
            alive=alive,
            sky_dir=sky_dir,
            sky_w=sky_w,
        )

    init = _PTState(
        o=o,
        d=d,
        radiance=Vec3.full_like(o, 0.0, 0.0, 0.0),
        throughput=Vec3.full_like(o, 1.0, 1.0, 1.0),
        alive=jnp.ones(o.x.shape, bool),
        sky_dir=d,
        sky_w=Vec3.full_like(o, 0.0, 0.0, 0.0),
    )
    final = jax.lax.fori_loop(0, cfg.bounce_limit, body, init)

    sky = sample_skybox(scene.skybox, final.sky_dir,
                        bilinear=cfg.skybox_bilinear)
    return Vec3(
        final.radiance.x + final.sky_w.x * sky.x,
        final.radiance.y + final.sky_w.y * sky.y,
        final.radiance.z + final.sky_w.z * sky.z,
    )


def pathtrace_frame(
    scene, lights: AreaLights, cfg: RenderConfig, key, *,
    reduce: str = "mean",
) -> Vec3:
    """Render one progressive frame: (H, W) Vec3 radiance, averaged over
    cfg.rays_per_pixel stochastic samples with random subpixel jitter.

    ``reduce='sum'`` returns the UNCLIPPED per-pixel radiance sum over the
    local samples — the multi-chip sample-sharded path psums slices across
    devices and applies the divide + clip once globally, so the sharded
    estimator is the single-chip estimator with more samples, not an
    average of clipped partial means."""
    from ttrt.render.integrator import generate_rays

    dtype = cfg.dtype
    H, W, N = cfg.height, cfg.width, cfg.rays_per_pixel
    o, d = generate_rays(scene, cfg)

    # replace the deterministic triangle-wave jitter with random subpixel
    # jitter: perturb the (already-built) directions slightly in screen
    # space is not equivalent, so re-derive from pixel indices instead.
    cam = scene.camera
    sw = cam.screen_width.astype(dtype)
    sh = cam.screen_height.astype(dtype)
    k1, k2 = jax.random.split(key)
    jx = jax.random.uniform(k1, (H * W * N,), dtype, 0.0, sw / W)
    jy = jax.random.uniform(k2, (H * W * N,), dtype, 0.0, sh / H)

    col = jnp.tile(jnp.repeat(jnp.arange(W, dtype=dtype), N), H)
    row = jnp.repeat(jnp.arange(H, dtype=dtype), W * N)
    sx = (col / W) * sw - sw / 2.0 + jx
    sy = -((row / H) * sh - sh / 2.0) + jy
    sz = -cam.screen_distance.astype(dtype)
    f = cam.frame
    bx, by, bz = f.x_axis, f.y_axis, f.z_axis
    origin = f.origin_vec
    d = Vec3(
        sx * bx.x + sy * by.x + sz * bz.x - origin.x,
        sx * bx.y + sy * by.y + sz * bz.y - origin.y,
        sx * bx.z + sy * by.z + sz * bz.z - origin.z,
    ).normalize()

    color = pathtrace_batch(scene, lights, o, d, cfg, key)

    if reduce == "sum":
        def tot(c):
            return c.reshape(H, W, N).sum(axis=-1)

        return Vec3(tot(color.x), tot(color.y), tot(color.z))

    def avg(c):
        return c.reshape(H, W, N).mean(axis=-1)

    return Vec3(
        jnp.clip(avg(color.x), 0.0, 1.0),
        jnp.clip(avg(color.y), 0.0, 1.0),
        jnp.clip(avg(color.z), 0.0, 1.0),
    )
