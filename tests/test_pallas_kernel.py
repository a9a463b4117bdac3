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
    scene, cfg = _small_setup(maker, t)
    fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
    fb_pal, rays_pal = render_frame_pallas(scene, cfg, interpret=True)

    for a, b in zip(fb_ref, fb_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=2e-5
        )
    # trace accounting must agree exactly: same alive/shadow schedule
    assert int(rays_ref) == int(rays_pal)


def test_pallas_rejects_unsupported():
    scene, cfg = _small_setup()
    with pytest.raises(ValueError):
        render_frame_pallas(scene, cfg.with_(skybox_bilinear=True))
    with pytest.raises(ValueError):
        render_frame_pallas(scene, cfg.with_(dtype=jnp.float64))
