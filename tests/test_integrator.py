"""Integrator tests: ray generation, contribution weighting, bounce/AA
semantics (project_scene, TerminalRayTracer.c:965-1069)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.config import RenderConfig, constants
from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.frames import orbit_camera_frame
from ttrt.render.integrator import generate_rays, render_frame, trace_batch
from ttrt.scene import demo_scene
from ttrt.vec import triangle_wave

F64 = jnp.float64


def make_scene(t=1.0, W=32, H=16):
    sky = skybox_from_faces(make_colors_skybox(8), F64)
    scene = demo_scene(sky, W, H, F64)
    return scene.with_camera_frame(orbit_camera_frame(t, F64))


class TestRayGen:
    def test_shapes_and_normalization(self):
        W, H, N = 16, 8, 3
        cfg = RenderConfig(width=W, height=H, rays_per_pixel=N, dtype=F64)
        scene = make_scene(1.0, W, H)
        o, d = generate_rays(scene, cfg)
        assert o.x.shape == (W * H * N,)
        lens = np.asarray(d.length())
        np.testing.assert_allclose(lens, 1.0, atol=1e-12)

    def test_subpixel_jitter_matches_c_formula(self):
        W, H, N = 8, 4, 5
        cfg = RenderConfig(width=W, height=H, rays_per_pixel=N, dtype=F64)
        scene = make_scene(0.0, W, H)  # identity-ish camera at t=0
        o, d = generate_rays(scene, cfg)
        # reconstruct expected directions via the C expressions
        cam_b = np.asarray(scene.camera.frame.basis)
        cam_o = np.asarray(scene.camera.frame.origin)
        sw = float(scene.camera.screen_width)
        sh = float(scene.camera.screen_height)
        pw, ph = sw / W, sh / H
        dd = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)
        idx = 0
        for row in range(H):
            for col in range(W):
                for k in range(N):
                    sx = (col / W) * sw - sw / 2
                    sy = -((row / H) * sh - sh / 2)
                    sx += float(triangle_wave(2 * constants.PI * k / N)) / 2 * pw
                    sy += float(triangle_wave(constants.PI * k / N)) / 2 * ph
                    sz = -1.0
                    v = sx * cam_b[0] + sy * cam_b[1] + sz * cam_b[2] - cam_o
                    v = v / np.linalg.norm(v)
                    np.testing.assert_allclose(dd[idx], v, atol=1e-12)
                    idx += 1

    def test_direction_quirk_origin_subtracted(self):
        """The reference subtracts the camera ORIGIN from the rotated screen
        offset (TerminalRayTracer.c:1005). For the orbit camera this acts
        like a longer focal length; verify we reproduce it rather than the
        'correct' pinhole direction."""
        W, H = 4, 4
        cfg = RenderConfig(width=W, height=H, rays_per_pixel=1, dtype=F64)
        scene = make_scene(1.0, W, H)
        o, d = generate_rays(scene, cfg)
        cam_b = np.asarray(scene.camera.frame.basis)
        cam_o = np.asarray(scene.camera.frame.origin)
        # center-ish ray, sample 0 of pixel (0,0)
        sw = float(scene.camera.screen_width)
        sh = float(scene.camera.screen_height)
        sx = -sw / 2  # col 0, no jitter (k=0 -> tri(0)=0)
        sy = sh / 2
        v = sx * cam_b[0] + sy * cam_b[1] - 1.0 * cam_b[2] - cam_o
        v /= np.linalg.norm(v)
        got = np.array([d.x[0], d.y[0], d.z[0]])
        np.testing.assert_allclose(got, v, atol=1e-12)


class TestBounceLoop:
    def test_sky_only_single_bounce(self):
        # ray straight up from high altitude: pure sky, contribution_total=1
        scene = make_scene(1.0)
        cfg = RenderConfig(width=4, height=4, rays_per_pixel=1, dtype=F64)
        from ttrt.vec import Vec3

        o = Vec3(jnp.zeros((2,), F64), jnp.full((2,), 50.0, F64), jnp.zeros((2,), F64))
        d = Vec3(jnp.zeros((2,), F64), jnp.ones((2,), F64), jnp.zeros((2,), F64))
        color, rays = trace_batch(scene, o, d, cfg, count_rays=True)
        np.testing.assert_allclose(
            np.asarray(color.to_array()), [[0, 1, 0]] * 2, atol=1e-12
        )  # +Y colors face is green
        assert int(rays) == 2  # one trace each, no shadow rays on miss

    def test_contribution_weights_mirror_sphere(self):
        """reflectivity 1.0 -> equal contribution weight every bounce
        (TerminalRayTracer.c:1041): pixel = sum(colors)/n_bounces."""
        scene = make_scene(1.0)
        # aim at the +x mirror sphere dead center from +x axis:
        from ttrt.vec import Vec3

        o = Vec3(jnp.full((1,), 5.0, F64), jnp.zeros((1,), F64), jnp.zeros((1,), F64))
        d = Vec3(jnp.full((1,), -1.0, F64), jnp.zeros((1,), F64), jnp.zeros((1,), F64))
        for limit in (1, 2, 3):
            cfg = RenderConfig(
                width=4, height=4, rays_per_pixel=1, bounce_limit=limit,
                dtype=F64,
            )
            color, _ = trace_batch(scene, o, d, cfg)
            arr = np.asarray(color.to_array())[0]
            # head-on mirror hit: reflected ray returns along +x to the sky
            # (colors +X face = red). bounce colors: lit red sphere, then
            # (limit>1) sky red. all contributions equal (reflectivity 1).
            assert np.isfinite(arr).all()
            assert arr.max() <= 1.0 and arr.min() >= 0.0

    def test_ray_counting_includes_shadow_rays(self):
        scene = make_scene(1.0)
        cfg = RenderConfig(width=8, height=8, rays_per_pixel=1, dtype=F64)
        fb, rays = render_frame(scene, cfg, count_rays=True)
        n_px = 8 * 8
        # every ray traces at least once; hits add 2 shadow traces/bounce
        assert int(rays) >= n_px
        assert int(rays) <= n_px * cfg.bounce_limit * 3

    def test_render_frame_shapes_and_range(self):
        scene = make_scene(2.5)
        cfg = RenderConfig(width=12, height=6, rays_per_pixel=2, dtype=F64)
        fb, _ = render_frame(scene, cfg)
        arr = np.asarray(fb.to_array())
        assert arr.shape == (6, 12, 3)
        assert np.isfinite(arr).all()
        assert arr.min() >= 0.0 and arr.max() <= 1.0

    def test_f32_close_to_f64(self):
        scene64 = make_scene(1.7, 24, 12)
        scene32 = jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            scene64,
        )
        cfg64 = RenderConfig(width=24, height=12, rays_per_pixel=2, dtype=F64)
        cfg32 = cfg64.with_(dtype=jnp.float32)
        fb64, _ = render_frame(scene64, cfg64)
        fb32, _ = render_frame(scene32, cfg32)
        a64 = np.asarray(fb64.to_array())
        a32 = np.asarray(fb32.to_array())
        # f32 path: expect agreement except knife-edge pixels
        close = np.abs(a64 - a32).max(axis=-1) < 2e-2
        assert close.mean() > 0.9
