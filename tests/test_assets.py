"""Asset I/O tests (read_ppm/load_skybox semantics,
TerminalRayTracer.c:307-436)."""

import numpy as np
import pytest

from ttrt.assets import (
    AssetError,
    load_skybox,
    load_skybox_faces,
    make_colors_skybox,
    make_starfield_skybox,
    make_uv_checker_skybox,
    read_ppm,
    skybox_from_faces,
    write_ppm,
)


class TestReadPPM:
    def test_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        p = tmp_path / "t.ppm"
        write_ppm(str(p), img)
        got = read_ppm(str(p))
        np.testing.assert_array_equal(got, img)

    def test_header_comments_skipped(self, tmp_path):
        # '#' comments in the header (TerminalRayTracer.c:335-339)
        p = tmp_path / "c.ppm"
        p.write_bytes(b"P6\n# a comment\n# another\n2 1\n255\n" + bytes(6))
        got = read_ppm(str(p))
        assert got.shape == (1, 2, 3)

    def test_rejects_non_p6(self, tmp_path):
        p = tmp_path / "p3.ppm"
        p.write_bytes(b"P3\n1 1\n255\n0 0 0\n")
        with pytest.raises(AssetError, match="not ppm"):
            read_ppm(str(p))

    def test_rejects_maxval_not_255(self, tmp_path):
        # 8-bit only (TerminalRayTracer.c:351-356)
        p = tmp_path / "m.ppm"
        p.write_bytes(b"P6\n1 1\n65535\n" + bytes(6))
        with pytest.raises(AssetError, match="max color value"):
            read_ppm(str(p))

    def test_missing_file(self):
        with pytest.raises(AssetError, match="Error opening file"):
            read_ppm("/nonexistent/file.ppm")

    def test_truncated_data(self, tmp_path):
        p = tmp_path / "t.ppm"
        p.write_bytes(b"P6\n4 4\n255\n" + bytes(10))
        with pytest.raises(AssetError, match="truncated"):
            read_ppm(str(p))

    def test_reads_reference_asset(self, reference_available):
        if not reference_available:
            pytest.skip("reference not present")
        img = read_ppm("/root/reference/skybox/colors/+X.ppm")
        assert img.shape == (256, 256, 3)
        assert (img == [255, 0, 0]).all()


class TestLoadSkybox:
    def test_dim_mismatch_rejected(self, tmp_path):
        # all faces must be square + same size (TerminalRayTracer.c:411-417)
        d = tmp_path / "sb"
        d.mkdir()
        for name, dim in zip(
            ["+X", "-X", "+Y", "-Y", "+Z", "-Z"], [4, 4, 4, 4, 4, 8]
        ):
            write_ppm(
                str(d / f"{name}.ppm"),
                np.zeros((dim, dim, 3), np.uint8),
            )
        with pytest.raises(AssetError, match="same size"):
            load_skybox_faces(str(d))

    def test_procedural_fallback_names(self):
        for name in ["colors", "uv_checker", "milky_way", "starfield"]:
            sky = load_skybox(name)
            assert sky.dim == 256

    def test_unknown_name_raises(self):
        with pytest.raises(AssetError, match="Error opening skybox"):
            load_skybox("not_a_skybox_name")

    def test_explicit_directory(self, tmp_path):
        d = tmp_path / "mysky"
        d.mkdir()
        for name in ["+X", "-X", "+Y", "-Y", "+Z", "-Z"]:
            write_ppm(str(d / f"{name}.ppm"), np.full((4, 4, 3), 7, np.uint8))
        sky = load_skybox(str(d))
        assert sky.dim == 4

    def test_reference_directory_layout(self, reference_available):
        if not reference_available:
            pytest.skip("reference not present")
        faces = load_skybox_faces("/root/reference/skybox/colors")
        assert faces.shape == (6, 256, 256, 3)


class TestProcedural:
    def test_colors_matches_reference_assets(self, reference_available):
        if not reference_available:
            pytest.skip("reference not present")
        ours = make_colors_skybox(256)
        theirs = load_skybox_faces("/root/reference/skybox/colors")
        np.testing.assert_array_equal(ours, theirs)

    def test_shapes_and_types(self):
        for gen in (make_colors_skybox, make_uv_checker_skybox, make_starfield_skybox):
            f = gen(32)
            assert f.shape == (6, 32, 32, 3) and f.dtype == np.uint8

    def test_skybox_packing_roundtrip(self, rng):
        f = rng.integers(0, 256, (6, 2, 2, 3), dtype=np.uint8)
        sky = skybox_from_faces(f)
        assert sky.packed.dtype == np.uint32 and sky.dim == 2
        np.testing.assert_array_equal(np.asarray(sky.to_uint8()), f)


class TestReferenceAssets:
    """Load the reference repository's actual shipped PPM cubemaps (read
    only) through our P6 reader — real-file parity for the asset layer."""

    def test_load_reference_colors_skybox(self, reference_available):
        import os
        if not reference_available or not os.path.isdir(
            "/root/reference/skybox/colors"
        ):
            pytest.skip("reference assets unavailable")
        faces = load_skybox_faces("/root/reference/skybox/colors")
        assert faces.shape == (6, 256, 256, 3)
        # the shipped 'colors' faces are solid: +X pure red, +Z pure blue
        assert (faces[0] == np.array([255, 0, 0], np.uint8)).all()
        assert (faces[4] == np.array([0, 0, 255], np.uint8)).all()
        # and match our procedural regeneration texel-for-texel
        np.testing.assert_array_equal(faces, make_colors_skybox(256))

    def test_load_reference_uv_checker(self, reference_available):
        import os
        if not reference_available or not os.path.isdir(
            "/root/reference/skybox/uv_checker"
        ):
            pytest.skip("reference assets unavailable")
        faces = load_skybox_faces("/root/reference/skybox/uv_checker")
        assert faces.shape[0] == 6
        assert faces.shape[1] == faces.shape[2]  # square faces
        # a render against the real files must work end to end
        import jax.numpy as jnp
        from ttrt.config import RenderConfig
        from ttrt.render.integrator import render_frame
        from ttrt.scene import demo_scene

        sky = skybox_from_faces(faces, jnp.float32)
        cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                           bounce_limit=2, dtype=jnp.float32)
        scene = demo_scene(sky, 16, 8, jnp.float32)
        fb, _ = render_frame(scene, cfg)
        assert np.isfinite(np.asarray(fb.to_array())).all()
