"""The integrator: ray generation, masked multi-bounce loop, AA averaging.

Reference: project_scene (TerminalRayTracer.c:965-1069) — a serial
row/column/sample/bounce loop nest. TPU-first restructuring:

  - The pixel x sample grid becomes ONE flat ray batch (H*W*spp lanes of
    SoA components); every elementwise op runs across all rays at once on
    the VPU and XLA fuses the whole chain.
  - The divergent per-ray `while` bounce loop becomes a whole-batch
    `lax.while_loop` with a per-lane ``alive`` mask: accumulator updates
    are masked, and the loop exits early when every lane has terminated
    (the demo scene's common case: most rays die on bounce 1-2).
  - Shadow traces inside lighting are themselves full-batch traces, so a
    bounce iteration is (1 + num_lights) fused scene traversals.

Parity notes:
  - AA jitter is the reference's deterministic triangle-wave subpixel
    offset (TerminalRayTracer.c:992-993): sample k of N offsets by
    tri(2*pi*k/N)/2 * pixel_w in x and tri(pi*k/N)/2 * pixel_h in y.
  - Ray direction reproduces the reference's construction EXACTLY,
    including its quirk: direction = sx*bx + sy*by + sz*bz - camera_origin
    (TerminalRayTracer.c:996-1008) — the rotated screen offset minus the
    camera POSITION (not the screen-to-origin vector). For the demo's
    origin-orbiting camera this behaves like a longer focal length; any
    parity target must replicate it.
  - Per-bounce weighting: contribution starts at 1, multiplies by material
    reflectivity on each hit, terminates on miss/limit/1e-5 cutoff; the
    pixel is the contribution-weighted color sum normalized by the total
    weight, then averaged over samples (TerminalRayTracer.c:1012-1065).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ttrt.config import RenderConfig, constants
from ttrt.render import dispatch
from ttrt.render.lighting import apply_lighting
from ttrt.render.skybox import sample_skybox
from ttrt.scene import HIT_NONE, Scene
from ttrt.vec import Vec3, triangle_wave


def generate_rays(
    scene: Scene, cfg: RenderConfig, row_start=0, n_rows: Optional[int] = None
) -> Tuple[Vec3, Vec3]:
    """Build the flat (n_rows*W*spp,) primary ray batch
    (TerminalRayTracer.c:980-1011). ``row_start``/``n_rows`` select a
    horizontal band of the image (the whole frame by default) — the tiled
    high-res path maps over bands so peak memory stays one band, not one
    frame."""
    dtype = cfg.dtype
    cam = scene.camera
    W, H, N = cfg.width, cfg.height, cfg.rays_per_pixel
    if n_rows is None:
        n_rows = H

    sw = cam.screen_width.astype(dtype)
    sh = cam.screen_height.astype(dtype)
    pixel_w = sw / W
    pixel_h = sh / H

    col = jnp.arange(W, dtype=dtype)
    row = jnp.arange(n_rows, dtype=dtype) + jnp.asarray(row_start, dtype)
    k = jnp.arange(N, dtype=dtype)

    base_x = (col / W) * sw - sw / 2.0  # (W,)
    base_y = -((row / H) * sh - sh / 2.0)  # (H,)
    jit_x = triangle_wave(2.0 * constants.PI * k / N) / 2.0 * pixel_w  # (N,)
    jit_y = triangle_wave(constants.PI * k / N) / 2.0 * pixel_h  # (N,)

    # broadcast to (H, W, N) then flatten — row-major pixel order matches the
    # reference's row*W+col framebuffer layout (TerminalRayTracer.c:1066).
    sx = base_x[None, :, None] + jit_x[None, None, :]
    sy = base_y[:, None, None] + jit_y[None, None, :]
    sx = jnp.broadcast_to(sx, (n_rows, W, N)).reshape(-1)
    sy = jnp.broadcast_to(sy, (n_rows, W, N)).reshape(-1)
    sz = -cam.screen_distance.astype(dtype)

    bx, by, bz = cam.frame.x_axis, cam.frame.y_axis, cam.frame.z_axis
    origin = cam.frame.origin_vec

    # reference quirk: direction = offset-in-basis - camera origin
    # (TerminalRayTracer.c:1005), then guarded normalize.
    d = Vec3(
        sx * bx.x + sy * by.x + sz * bz.x - origin.x,
        sx * bx.y + sy * by.y + sz * bz.y - origin.y,
        sx * bx.z + sy * by.z + sz * bz.z - origin.z,
    ).normalize()
    o = Vec3(
        jnp.broadcast_to(origin.x, d.x.shape),
        jnp.broadcast_to(origin.y, d.y.shape),
        jnp.broadcast_to(origin.z, d.z.shape),
    )
    return o.astype(dtype), d


class _BounceState(NamedTuple):
    i: jnp.ndarray  # bounce counter (scalar)
    o: Vec3
    d: Vec3
    pixel: Vec3  # contribution-weighted color accumulator
    contribution: jnp.ndarray
    total: jnp.ndarray  # contribution_total
    still_going: jnp.ndarray  # bool per ray
    sky_dir: Vec3  # direction at sky termination (deferred gather)
    sky_weight: jnp.ndarray  # contribution at sky termination, 0 if none
    ray_count: jnp.ndarray  # scalar: total traces performed (primary+shadow)


def trace_batch(
    scene: Scene,
    o: Vec3,
    d: Vec3,
    cfg: RenderConfig,
    *,
    count_rays: bool = False,
) -> Tuple[Vec3, jnp.ndarray]:
    """Run the masked bounce loop on a ray batch; returns the per-ray
    normalized color (pixel_color / contribution_total,
    TerminalRayTracer.c:1012-1061) and the scalar count of scene traversals
    performed (for honest Mrays/s accounting)."""
    dtype = cfg.dtype
    n_lights = scene.directional_lights.count + scene.point_lights.count
    eps = jnp.asarray(constants.CONTRIBUTION_EPS, dtype)

    def alive_of(s: _BounceState) -> jnp.ndarray:
        return s.still_going & (s.contribution > eps)

    def cond(s: _BounceState) -> jnp.ndarray:
        return (s.i < cfg.bounce_limit) & jnp.any(alive_of(s))

    def body(s: _BounceState) -> _BounceState:
        alive = alive_of(s)
        # sample_sky=False: the skybox gather — the renderer's dominant
        # memory op — is DEFERRED out of the bounce loop. A ray reaches the
        # sky at most once, always as its LAST contribution, so recording
        # (direction, weight) here and gathering once after the loop is
        # bit-identical to the reference's in-loop sampling order.
        hit = dispatch.trace(scene, s.o, s.d, sample_sky=False)
        is_hit = hit.kind != HIT_NONE
        miss_now = alive & ~is_hit

        view = -s.d
        lit = apply_lighting(
            scene, hit.point, view, hit.normal, hit.material.color,
            hit.material.specularity, specular=cfg.specular,
        )
        # miss lanes contribute 0 in-loop (sky color added post-loop)
        color = lit.where(is_hit, Vec3.full_like(s.d, 0.0, 0.0, 0.0))
        sky_weight = jnp.where(miss_now, s.contribution, s.sky_weight)
        sky_dir = s.d.where(miss_now, s.sky_dir)

        total = s.total + jnp.where(alive, s.contribution, 0.0)
        if cfg.energy_model == "subtract":
            # roadmap model (TerminalRayTracer.c:24-28): local shading is
            # weighted by (1 - reflectivity); the reflected continuation
            # carries contribution * reflectivity (below), so path
            # weights partition unity and no normalization happens.
            cw = s.contribution * (1.0 - hit.material.reflectivity)
        else:
            cw = s.contribution
        pixel = Vec3(
            s.pixel.x + jnp.where(alive, cw * color.x, 0.0),
            s.pixel.y + jnp.where(alive, cw * color.y, 0.0),
            s.pixel.z + jnp.where(alive, cw * color.z, 0.0),
        )
        new_contribution = jnp.where(
            alive,
            jnp.where(is_hit, s.contribution * hit.material.reflectivity, 0.0),
            s.contribution,
        )
        still_going = jnp.where(alive, is_hit, s.still_going)

        # reflected continuation ray (TerminalRayTracer.c:1054-1056); updating
        # dead lanes is harmless — their accumulators are frozen.
        new_d = s.d.reflect(hit.normal).normalize()
        new_o = hit.point

        if count_rays:
            # uint32 is ample: one frame's traces peak well under 2^32.
            n_alive = jnp.sum(alive.astype(jnp.uint32))
            n_shadow = jnp.sum((alive & is_hit).astype(jnp.uint32)) * jnp.uint32(
                n_lights
            )
            ray_count = (s.ray_count + n_alive + n_shadow).astype(jnp.uint32)
        else:
            ray_count = s.ray_count

        return _BounceState(
            i=s.i + 1,
            o=new_o,
            d=new_d,
            pixel=pixel,
            contribution=new_contribution,
            total=total,
            still_going=still_going,
            sky_dir=sky_dir,
            sky_weight=sky_weight,
            ray_count=ray_count,
        )

    init = _BounceState(
        i=jnp.zeros((), jnp.int32),
        o=o,
        d=d,
        pixel=Vec3.full_like(o, 0.0, 0.0, 0.0),
        contribution=jnp.ones_like(o.x),
        total=jnp.zeros_like(o.x),
        still_going=jnp.ones(o.x.shape, bool),
        sky_dir=d,  # any valid direction; weight 0 until a miss records it
        sky_weight=jnp.zeros_like(o.x),
        ray_count=jnp.zeros((), jnp.uint32),
    )
    final = jax.lax.while_loop(cond, body, init)

    # deferred skybox gather: ONE pass over the ray batch
    sky = sample_skybox(
        scene.skybox, final.sky_dir, bilinear=cfg.skybox_bilinear
    )
    pixel = Vec3(
        final.pixel.x + final.sky_weight * sky.x,
        final.pixel.y + final.sky_weight * sky.y,
        final.pixel.z + final.sky_weight * sky.z,
    )

    if cfg.energy_model == "subtract":
        # path weights already partition unity (truncated energy absorbed)
        return pixel, final.ray_count
    inv_total = 1.0 / final.total  # total >= 1 (first bounce always counts)
    color = Vec3(
        pixel.x * inv_total, pixel.y * inv_total, pixel.z * inv_total
    )
    return color, final.ray_count


def render_frame(
    scene: Scene, cfg: RenderConfig, *, count_rays: bool = False
) -> Tuple[Vec3, jnp.ndarray]:
    """Render one frame: returns the (H, W) float framebuffer as a Vec3 of
    (H, W) channel arrays (the reference's Screen.pixels,
    TerminalRayTracer.c:186-193) plus the trace count."""
    o, d = generate_rays(scene, cfg)
    color, ray_count = trace_batch(scene, o, d, cfg, count_rays=count_rays)
    H, W, N = cfg.height, cfg.width, cfg.rays_per_pixel

    def avg(c):
        # sum then scale by 1/N (TerminalRayTracer.c:1063-1065)
        return c.reshape(H, W, N).sum(axis=-1) * (1.0 / N)

    return Vec3(avg(color.x), avg(color.y), avg(color.z)), ray_count


def render_frame_tiled(
    scene: Scene, cfg: RenderConfig, n_bands: int = 8,
    *, count_rays: bool = False,
) -> Tuple[Vec3, jnp.ndarray]:
    """High-res still path (BASELINE config 2): render the image in
    ``n_bands`` horizontal bands via lax.map so peak live memory is one
    band's ray state instead of the whole frame's (a 1920x1080x4spp frame
    is 8.3M rays x ~20 state arrays — bands keep that bounded on any
    chip). One jit, one compile: every band shares the same program."""
    H, W, N = cfg.height, cfg.width, cfg.rays_per_pixel
    if H % n_bands:
        raise ValueError(f"height {H} not divisible by n_bands {n_bands}")
    bh = H // n_bands

    def band(i):
        o, d = generate_rays(scene, cfg, row_start=i * bh, n_rows=bh)
        color, rays = trace_batch(scene, o, d, cfg, count_rays=count_rays)

        def avg(c):
            return c.reshape(bh, W, N).sum(axis=-1) * (1.0 / N)

        return Vec3(avg(color.x), avg(color.y), avg(color.z)), rays

    fb_bands, rays = jax.lax.map(band, jnp.arange(n_bands))
    fb = Vec3(*(c.reshape(H, W) for c in fb_bands))
    return fb, rays.sum()


def render_image(scene: Scene, cfg: RenderConfig) -> jnp.ndarray:
    """Convenience: render to an (H, W, 3) float array."""
    fb, _ = render_frame(scene, cfg)
    return fb.to_array()
