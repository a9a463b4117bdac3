"""Pallas render kernel vs the fused-XLA oracle.

The kernel (ttrt.kernels.render_pallas) must reproduce the integrator's
output on the demo scene — same math, same op order — so a small config is
compared element-wise in interpret mode (tests run on CPU; the compiled
Mosaic path is exercised on real TPU by bench.py and the app)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, make_uv_checker_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.render_pallas import render_frame_pallas
from ttrt.render.integrator import render_frame
from ttrt.scene import demo_scene
import jax


def _small_setup(skybox_maker=make_colors_skybox, t=0.7):
    cfg = RenderConfig(
        width=32, height=16, rays_per_pixel=2, bounce_limit=10,
        dtype=jnp.float32,
    )
    scene = demo_scene(
        skybox_from_faces(skybox_maker(16), jnp.float32),
        cfg.width, cfg.height, jnp.float32,
    )
    frame = jax.tree.map(
        lambda a: a.astype(jnp.float32), orbit_camera_frame(t, jnp.float32)
    )
    return scene.with_camera_frame(frame), cfg


@pytest.mark.parametrize("maker,t", [
    (make_colors_skybox, 0.7),
    (make_uv_checker_skybox, 3.3),
])
def test_pallas_matches_oracle(maker, t):
    """The kernel reorders fp math for speed (rsqrt normalize, sqrt-free
    hit predicates, shared 1/(2a)), so lanes sitting EXACTLY on a
    hit/shadow boundary may flip vs the oracle. Contract: almost every
    pixel agrees to fp noise; boundary flips are rare."""
    scene, cfg = _small_setup(maker, t)
    fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
    fb_pal, rays_pal = render_frame_pallas(scene, cfg, interpret=True)

    ref = np.asarray(fb_ref.to_array())
    pal = np.asarray(fb_pal.to_array())
    diff = np.abs(ref - pal).max(axis=-1)
    frac_loose = float((diff > 1e-3).mean())
    assert frac_loose <= 0.01, f"{frac_loose:.4f} of pixels off >1e-3"
    assert float(np.median(diff)) < 2e-5
    # trace accounting: same schedule modulo boundary flips
    assert abs(int(rays_ref) - int(rays_pal)) <= max(
        0.005 * int(rays_ref), 16
    )


def test_pallas_rejects_unsupported():
    scene, cfg = _small_setup()
    with pytest.raises(ValueError):
        render_frame_pallas(scene, cfg.with_(skybox_bilinear=True))
    with pytest.raises(ValueError):
        render_frame_pallas(scene, cfg.with_(dtype=jnp.float64))


@pytest.mark.parametrize("name", ["colors", "uv_checker"])
def test_procedural_sky_matches_textured(name):
    """The in-kernel procedural cubemap evaluation replays the generator's
    float32 arithmetic exactly, BUT the accumulating kernel layout also
    computes the AA jitter from a scalar sample index instead of a vector
    — a last-ulp ray-direction difference that can flip isolated
    hit-boundary pixels. Contract: the sky COLOR math is exact (median
    diff 0), flips are rare, and the trace schedule is preserved."""
    from ttrt.assets import load_skybox
    from ttrt.scene import Skybox

    cfg = RenderConfig(width=32, height=16, rays_per_pixel=2,
                       bounce_limit=6, dtype=jnp.float32)
    sky_tagged = load_skybox(name)
    assert sky_tagged.procedural == name
    sky_plain = Skybox(sky_tagged.packed, procedural=None)

    frame = jax.tree.map(
        lambda a: a.astype(jnp.float32), orbit_camera_frame(2.1, jnp.float32)
    )

    def render(sky):
        scene = demo_scene(sky, cfg.width, cfg.height, jnp.float32)
        scene = scene.with_camera_frame(frame)
        fb, rays = render_frame_pallas(scene, cfg, interpret=True)
        return np.asarray(fb.to_array()), int(rays)

    img_tex, rays_tex = render(sky_plain)
    img_proc, rays_proc = render(sky_tagged)
    diff = np.abs(img_proc - img_tex).max(axis=-1)
    assert float(np.median(diff)) == 0.0  # sky math is bit-exact
    frac = float((diff > 1e-3).mean())
    assert frac <= 0.01, f"{frac:.4f} of pixels flipped"
    assert abs(rays_tex - rays_proc) <= max(0.005 * rays_tex, 16)
