"""Pallas pathtrace kernel (interpret mode): determinism, seed
sensitivity, and statistical parity with the XLA estimator.

The two paths share the estimator structure but draw from different RNG
streams (jax.random threefry vs the kernel's counter hash), so parity is
STATISTICAL: many-sample means must agree within Monte-Carlo error.
Small shapes — the interpret compile dominates on the 1-vCPU box.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.pathtrace_pallas import (_mix32, _u01,
                                           pathtrace_frame_pallas)
from ttrt.render.pathtrace import AreaLights, pathtrace_frame
from ttrt.scene import demo_scene

pytestmark = pytest.mark.slow


def _setup(spp):
    cfg = RenderConfig(width=16, height=8, rays_per_pixel=spp,
                       bounce_limit=3, dtype=jnp.float32)
    scene = demo_scene(
        skybox_from_faces(make_colors_skybox(16), jnp.float32,
                          procedural="colors"),
        cfg.width, cfg.height, jnp.float32,
    )
    frame = jax.tree.map(lambda a: a.astype(jnp.float32),
                         orbit_camera_frame(0.7, jnp.float32))
    scene = scene.with_camera_frame(frame)
    lights = AreaLights.create(
        positions=[[0.0, 3.0, 0.0]], radii=[0.5],
        colors=[[1.0, 1.0, 1.0]], intensities=[10.0],
    )
    return cfg, scene, lights


class TestCounterRng:
    def test_mix32_avalanche_and_uniformity(self):
        """The hash must avalanche (no trivial collisions) and u01 must be
        uniform enough for MC: mean ~0.5, all in [0, 1)."""
        x = jnp.arange(1 << 14, dtype=jnp.uint32)
        h = _mix32(x)
        assert len(np.unique(np.asarray(h))) == x.shape[0]  # bijective
        u = np.asarray(_u01(h))
        assert (u >= 0.0).all() and (u < 1.0).all()
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(np.mean(u < 0.25) - 0.25) < 0.02

    def test_consecutive_seeds_decorrelated(self):
        u0 = np.asarray(_u01(_mix32(jnp.arange(4096, dtype=jnp.uint32))))
        u1 = np.asarray(_u01(_mix32(
            jnp.arange(4096, dtype=jnp.uint32) ^ _mix32(jnp.uint32(1))
        )))
        assert abs(np.corrcoef(u0, u1)[0, 1]) < 0.05


class TestPathtracePallas:
    def test_deterministic_given_seed(self):
        cfg, scene, lights = _setup(2)
        fb1 = pathtrace_frame_pallas(scene, lights, cfg, 7, interpret=True)
        fb2 = pathtrace_frame_pallas(scene, lights, cfg, 7, interpret=True)
        np.testing.assert_array_equal(np.asarray(fb1.x), np.asarray(fb2.x))
        np.testing.assert_array_equal(np.asarray(fb1.z), np.asarray(fb2.z))

    def test_seed_changes_samples(self):
        cfg, scene, lights = _setup(2)
        fb1 = pathtrace_frame_pallas(scene, lights, cfg, 7, interpret=True)
        fb3 = pathtrace_frame_pallas(scene, lights, cfg, 8, interpret=True)
        assert np.abs(np.asarray(fb1.x) - np.asarray(fb3.x)).max() > 0.0

    def test_statistical_parity_with_xla(self):
        """Means over many stochastic samples agree between the kernel and
        the XLA estimator (identical estimator, independent RNG): the
        per-pixel difference of two 64-sample means must sit within a few
        MC standard errors, and the image-wide means must match tightly."""
        cfg, scene, lights = _setup(64)
        fb_k = pathtrace_frame_pallas(scene, lights, cfg, 3, interpret=True)
        fb_x = pathtrace_frame(scene, lights, cfg, jax.random.PRNGKey(3))
        a = np.stack([np.asarray(c) for c in (fb_k.x, fb_k.y, fb_k.z)])
        b = np.stack([np.asarray(c) for c in (fb_x.x, fb_x.y, fb_x.z)])
        # image-wide mean: MC error ~sigma/sqrt(npix*spp) — tight
        assert abs(a.mean() - b.mean()) < 0.01, (a.mean(), b.mean())
        # per-pixel: loose 3-sigma-ish bound for 64-sample means
        assert np.abs(a - b).mean() < 0.05
        assert np.percentile(np.abs(a - b), 95) < 0.15


def test_bilinear_flag_reaches_pathtrace_kernel():
    """cfg.skybox_bilinear swaps the in-kernel sky eval (procedural
    4-tap); previously the flag was silently ignored on this path. Use
    the uv_checker sky — 'colors' is flat per face, so bilinear would be
    indistinguishable from nearest there."""
    import numpy as np

    from ttrt.assets import make_uv_checker_skybox
    from ttrt.kernels.pathtrace_pallas import pathtrace_frame_pallas

    cfg, scene, lights = _setup(2)
    scene = scene._replace(skybox=skybox_from_faces(
        make_uv_checker_skybox(16), jnp.float32, procedural="uv_checker"
    ))
    fb_n = pathtrace_frame_pallas(scene, lights, cfg, 3, interpret=True)
    fb_b = pathtrace_frame_pallas(
        scene, lights, cfg.with_(skybox_bilinear=True), 3, interpret=True
    )
    a = np.asarray(fb_n.to_array())
    b = np.asarray(fb_b.to_array())
    assert not np.array_equal(a, b)
