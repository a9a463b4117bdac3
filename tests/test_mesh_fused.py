"""Fused whole-frame mesh kernel (interpret mode): parity vs the XLA
mesh oracle at the SAME bar as the demo kernel — quantized-u8 exactness
with an ENUMERATED knife-edge set (knife_util; VERDICT r3 #3 replaced
this file's former blanket 3%-flip tolerance) — subcluster-visit-order
invariance (the near-to-far + best-t-prune sweep must be a pure
optimization), packed live-bit chunk-boundary coverage (>4 chunks), and
the textured counter-stream path.

Small scenes + tile_rows=8: the interpret program's XLA:CPU compile is
the dominant cost on the 1-vCPU box (~2 min per static variant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ttrt.kernels.mesh_fused as mf
from knife_util import assert_quantized_exact_off_knife
from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.mesh_fused import render_frame_mesh_fused
from ttrt.kernels.render_pallas import (pack_camera, pack_dlights,
                                        pack_plights)
from ttrt.mesh import many_sphere_scene
from ttrt.render.integrator import render_frame

pytestmark = pytest.mark.slow


def _cfg():
    return RenderConfig(width=24, height=12, rays_per_pixel=2,
                        bounce_limit=3, dtype=jnp.float32)


def _scene(cfg, procedural, n_spheres=200):
    scene = many_sphere_scene(
        skybox_from_faces(make_colors_skybox(16), jnp.float32,
                          procedural=procedural),
        n_spheres=n_spheres, width_px=cfg.width, height_px=cfg.height,
        seed=5, floor_cells=3,
    )
    frame = jax.tree.map(lambda a: a.astype(jnp.float32),
                         orbit_camera_frame(0.9, jnp.float32))
    return scene.with_camera_frame(frame)


class TestFusedParity:
    @pytest.mark.parametrize("procedural", [None, "colors"])
    def test_quantized_exact_off_knife_edges(self, procedural):
        cfg = _cfg()
        scene = _scene(cfg, procedural)
        fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
        fb, rays = render_frame_mesh_fused(scene, cfg, interpret=True,
                                           tile_rows=8)
        # trace accounting is exact (same bounce/hit decisions)
        assert int(rays) == int(rays_ref)
        # cap = measured knife fraction + margin (this scene/frame:
        # ~19-21% — a 200-sphere cloud has many silhouettes at 24x12)
        assert_quantized_exact_off_knife(
            fb_ref.to_array(), fb.to_array(), scene, cfg, knife_cap=0.30,
        )

    def test_chunk_boundary_sweep(self):
        """>4 chunks of the packed live-bit sweep (VERDICT r3 #3: the
        round-3 optimization extracts 4 subclusters' flags per scalar
        sync, and the 200-sphere parity scene only ever exercised ONE
        chunk). 2240 spheres -> kb_sph=18 (+1 tri subcluster) = 19
        subclusters = 5 chunks, so live-bit extraction crosses chunk
        boundaries and the byte-lane packing is wrong-winner-visible."""
        cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                           bounce_limit=2, dtype=jnp.float32)
        scene = _scene(cfg, "colors", n_spheres=2240)
        K = scene.clusters.kb_sph + scene.clusters.kb_tri
        assert K >= 17, f"scene too small to cross 4 chunks (K={K})"
        fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
        fb, rays = render_frame_mesh_fused(scene, cfg, interpret=True,
                                           tile_rows=8)
        assert int(rays) == int(rays_ref)
        assert_quantized_exact_off_knife(
            fb_ref.to_array(), fb.to_array(), scene, cfg, knife_cap=0.40,
        )

    def test_hierarchical_sweep_bitwise_across_superchunks(self):
        """The two-level sweep (one union AABB per static chunk gates 8
        chunks per sync — the 100k tier's dead-floor fix, round 5) must
        be BITWISE identical to the flat sweep across a superchunk
        boundary: 4480 spheres -> kb_sph=35 (+1 tri) = 36 subclusters =
        9 chunks = 2 superchunks. Exercises the sentinel-chunk order
        padding (9 -> 16 slots), the NaN super/quarter pad rows, and the
        super-level stale-BTF prune (conservative: may only WIDEN the
        chunk keep set). Bitwise-vs-flat is the right bar — the flat
        sweep's own oracle parity is covered by the tests above (this
        scene is too silhouette-dense at 16x8 for the blanket
        within-knife flip budget); the oracle link here is exact trace
        accounting, which matches only if every bounce/hit decision
        does."""
        cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                           bounce_limit=2, dtype=jnp.float32)
        scene = _scene(cfg, "colors", n_spheres=4480)
        K = scene.clusters.kb_sph + scene.clusters.kb_tri
        assert -(-(-(-K // 4)) // mf.SUPERCHUNK) >= 2, (
            f"scene too small to cross a superchunk boundary (K={K})"
        )
        _, rays_ref = render_frame(scene, cfg, count_rays=True)
        fb0, r0 = render_frame_mesh_fused(scene, cfg, interpret=True,
                                          tile_rows=8, hierarchy=False)
        fb1, r1 = render_frame_mesh_fused(scene, cfg, interpret=True,
                                          tile_rows=8, hierarchy=True)
        np.testing.assert_array_equal(np.asarray(fb0.x), np.asarray(fb1.x))
        np.testing.assert_array_equal(np.asarray(fb0.y), np.asarray(fb1.y))
        np.testing.assert_array_equal(np.asarray(fb0.z), np.asarray(fb1.z))
        assert int(r0) == int(r1) == int(rays_ref)

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
    cubemaps via the deferred 4-tap epilogue (round 4, as the demo
    kernel — idx00 in the counter stream + two weight streams)."""

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

    def test_bilinear_image_cubemap_matches_oracle(self):
        """Deferred 4-tap image bilinear on the fused kernel: the full
        quantized-exact-off-knife parity bar vs the XLA mesh integrator
        with cfg.skybox_bilinear, and the flag must change the image."""
        import numpy as np

        from ttrt.kernels.mesh_fused import render_frame_mesh_fused
        from ttrt.render.integrator import render_frame

        scene, cfg = self._scene_cfg(procedural=None)
        cfg_b = cfg.with_(skybox_bilinear=True)
        fb_ref, rays_ref = render_frame(scene, cfg_b, count_rays=True)
        fb, rays = render_frame_mesh_fused(scene, cfg_b, interpret=True,
                                           tile_rows=8)
        assert int(rays) == int(rays_ref)
        b = np.asarray(fb.to_array())
        assert_quantized_exact_off_knife(
            fb_ref.to_array(), b, scene, cfg_b, knife_cap=0.40,
        )
        fb_n, _ = render_frame_mesh_fused(scene, cfg, interpret=True,
                                          tile_rows=8)
        assert not np.array_equal(b, np.asarray(fb_n.to_array())), (
            "bilinear flag did not change the image"
        )

    def test_specular_matches_xla(self):
        """The Blinn-Phong extension in-kernel on the fused mesh path
        (VERDICT r3 #6): parity vs the XLA mesh integrator with
        cfg.specular, same bar as the diffuse oracle test — float-exact
        median, sparse knife flips only — and the flag must actually
        change the image."""
        import numpy as np

        from ttrt.kernels.mesh_fused import render_frame_mesh_fused
        from ttrt.render.integrator import render_frame

        scene, cfg = self._scene_cfg(procedural="uv_checker")
        cfg_s = cfg.with_(specular=True, bounce_limit=2)
        fb_ref, rays_ref = render_frame(scene, cfg_s, count_rays=True)
        fb, rays = render_frame_mesh_fused(scene, cfg_s, interpret=True,
                                           tile_rows=8)
        assert int(rays) == int(rays_ref)
        b = np.asarray(fb.to_array())
        assert_quantized_exact_off_knife(
            fb_ref.to_array(), b, scene, cfg_s, knife_cap=0.40,
        )
        fb_off, _ = render_frame_mesh_fused(
            scene, cfg.with_(bounce_limit=2), interpret=True, tile_rows=8
        )
        assert not np.array_equal(b, np.asarray(fb_off.to_array())), (
            "specular flag did not change the image"
        )
