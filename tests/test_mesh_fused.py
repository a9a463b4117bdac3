"""Fused whole-frame mesh kernel (interpret mode): parity vs the XLA
mesh oracle, subcluster-visit-order invariance (the near-to-far +
best-t-prune sweep must be a pure optimization), and the textured
counter-stream path.

Small scenes + tile_rows=8: the interpret program's XLA:CPU compile is
the dominant cost on the 1-vCPU box (~2 min per static variant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ttrt.kernels.mesh_fused as mf
from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.mesh_fused import render_frame_mesh_fused
from ttrt.kernels.render_pallas import (pack_camera, pack_dlights,
                                        pack_plights)
from ttrt.mesh import many_sphere_scene
from ttrt.render.integrator import render_frame


def _cfg():
    return RenderConfig(width=24, height=12, rays_per_pixel=2,
                        bounce_limit=3, dtype=jnp.float32)


def _scene(cfg, procedural):
    scene = many_sphere_scene(
        skybox_from_faces(make_colors_skybox(16), jnp.float32,
                          procedural=procedural),
        n_spheres=200, width_px=cfg.width, height_px=cfg.height, seed=5,
        floor_cells=3,
    )
    frame = jax.tree.map(lambda a: a.astype(jnp.float32),
                         orbit_camera_frame(0.9, jnp.float32))
    return scene.with_camera_frame(frame)


def _flips(a, b):
    q = lambda x: np.clip(
        (np.asarray(x, np.float64) * 255).astype(np.int32), 0, 255
    )
    return (q(a) != q(b)).any(axis=-1)


class TestFusedParity:
    @pytest.mark.parametrize("procedural", [None, "colors"])
    def test_matches_oracle(self, procedural):
        cfg = _cfg()
        scene = _scene(cfg, procedural)
        fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
        fb, rays = render_frame_mesh_fused(scene, cfg, interpret=True,
                                           tile_rows=8)
        # trace accounting is exact (same bounce/hit decisions)
        assert int(rays) == int(rays_ref)
        a = np.asarray(fb_ref.to_array())
        b = np.asarray(fb.to_array())
        d = np.abs(a - b)
        # float-side agreement everywhere but knife-edge pixels (the
        # documented any-hit shadow restructuring, as render_pallas)
        assert np.median(d) == 0.0
        assert _flips(a, b).mean() <= 0.03

    def test_visit_order_is_pure_optimization(self):
        """Reversing the near-to-far subcluster order (far-to-near, the
        prune's worst case) must be BITWISE identical: the best-t prune
        may only skip boxes that cannot beat the current winner."""
        cfg = _cfg()
        scene = _scene(cfg, "colors")
        pack = scene.clusters
        cam = pack_camera(scene.camera, jnp.float32)
        dl = pack_dlights(scene.directional_lights, jnp.float32)
        plt = pack_plights(scene.point_lights, jnp.float32)
        origin = scene.camera.frame.origin.astype(jnp.float32)
        order = mf.order_subclusters(pack, origin)
        aabb = mf._aabb_table(pack)

        def run(o):
            color, rays = mf._render_rays_fused(
                pack, cam, dl, plt, o, aabb,
                scene.skybox.packed.reshape(-1), cfg,
                pack.kb_sph, pack.kb_tri,
                scene.directional_lights.count, scene.point_lights.count,
                scene.skybox.dim, True, 8, "colors", True,
                cfg.height, cfg.rays_per_pixel, swizzle=(16, 32),
            )
            return np.asarray(color.x), np.asarray(color.y), rays

        x1, y1, r1 = run(order)
        x2, y2, r2 = run(order[::-1])
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
        assert int(r1) == int(r2)


class TestFusedBilinear:
    """The bilinear extension on the fused mesh kernel: procedural skies
    are served in-kernel (same 4-tap pattern replay as the demo kernel,
    bit-exactness covered by test_pallas_kernel's tap test); image
    cubemaps refuse with a pointer to the XLA path."""

    def _scene_cfg(self, procedural="uv_checker"):
        import jax
        import jax.numpy as jnp

        from ttrt.assets import make_uv_checker_skybox, skybox_from_faces
        from ttrt.config import RenderConfig
        from ttrt.frames import orbit_camera_frame
        from ttrt.mesh import many_sphere_scene

        cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                           bounce_limit=1, dtype=jnp.float32)
        scene = many_sphere_scene(
            skybox_from_faces(make_uv_checker_skybox(16), jnp.float32,
                              procedural=procedural),
            n_spheres=32, width_px=cfg.width, height_px=cfg.height,
            floor_cells=2,
        )
        frame = jax.tree.map(lambda a: a.astype(jnp.float32),
                             orbit_camera_frame(0.9, jnp.float32))
        return scene.with_camera_frame(frame), cfg

    def test_bilinear_flag_reaches_kernel(self):
        import numpy as np

        from ttrt.kernels.mesh_fused import render_frame_mesh_fused

        scene, cfg = self._scene_cfg()
        fb_n, _ = render_frame_mesh_fused(scene, cfg, interpret=True,
                                          tile_rows=8)
        fb_b, _ = render_frame_mesh_fused(
            scene, cfg.with_(skybox_bilinear=True), interpret=True,
            tile_rows=8,
        )
        a = np.asarray(fb_n.to_array())
        b = np.asarray(fb_b.to_array())
        assert not np.array_equal(a, b), (
            "bilinear filtering did not change the sky"
        )

    def test_bilinear_image_cubemap_refused(self):
        import pytest as _pytest

        from ttrt.kernels.mesh_fused import render_frame_mesh_fused

        scene, cfg = self._scene_cfg(procedural=None)
        with _pytest.raises(ValueError, match="bilinear"):
            render_frame_mesh_fused(
                scene, cfg.with_(skybox_bilinear=True), interpret=True,
                tile_rows=8,
            )

    def test_specular_refused(self):
        import pytest as _pytest

        from ttrt.kernels.mesh_fused import render_frame_mesh_fused

        scene, cfg = self._scene_cfg()
        with _pytest.raises(ValueError, match="specular"):
            render_frame_mesh_fused(
                scene, cfg.with_(specular=True), interpret=True,
                tile_rows=8,
            )
