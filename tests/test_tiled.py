"""Tiled (banded) rendering vs the whole-frame path.

Bitwise identity across the two programs is NOT expected: XLA folds the
constant-iota ray generation of the whole-frame program differently from
the banded program's runtime row offsets, producing 1-ulp direction
differences (measured: <=2e-7) that flip a handful of hit/shadow-boundary
rays. Contract: near-total agreement + rare bounded flips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.render.integrator import render_frame, render_frame_tiled
from ttrt.scene import demo_scene


def _setup(w=32, h=16, spp=2):
    cfg = RenderConfig(width=w, height=h, rays_per_pixel=spp,
                       bounce_limit=6, dtype=jnp.float32)
    scene = demo_scene(
        skybox_from_faces(make_colors_skybox(16), jnp.float32), w, h,
        jnp.float32,
    )
    frame = jax.tree.map(
        lambda a: a.astype(jnp.float32), orbit_camera_frame(1.2, jnp.float32)
    )
    return scene.with_camera_frame(frame), cfg


@pytest.mark.parametrize("n_bands", [2, 4, 8])
def test_tiled_matches_whole_frame(n_bands):
    scene, cfg = _setup()
    fb, rays = jax.jit(
        lambda s: render_frame(s, cfg, count_rays=True)
    )(scene)
    fbt, rayst = jax.jit(
        lambda s: render_frame_tiled(s, cfg, n_bands, count_rays=True)
    )(scene)
    ref = np.asarray(fb.to_array())
    til = np.asarray(fbt.to_array())
    diff = np.abs(ref - til).max(axis=-1)
    frac = float((diff > 1e-3).mean())
    assert frac <= 0.03, f"{frac:.4f} of pixels off >1e-3"
    assert float(np.median(diff)) <= 2e-6
    assert abs(int(rays) - int(rayst)) <= max(0.01 * int(rays), 32)


def test_tiled_rejects_bad_band_count():
    scene, cfg = _setup(h=10)
    with pytest.raises(ValueError):
        render_frame_tiled(scene, cfg, 4)
