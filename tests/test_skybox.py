"""Skybox sampling tests: face selection, per-face uv fixups, texel indexing
vs a literal scalar transcription of get_skybox_color
(TerminalRayTracer.c:697-789)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, make_uv_checker_skybox, skybox_from_faces
from ttrt.render.skybox import CUBEMAP_AXES, sample_skybox, skybox_uv
from ttrt.vec import Vec3, vec3

F64 = jnp.float64


# --- scalar oracle: direct transcription of the C -----------------------

def c_get_skybox_uv(direction):
    d = np.asarray(direction, float)
    ln = np.linalg.norm(d)
    if ln > 1e-4:
        d = d / ln
    best_face, best_t = -1, -1.0
    for f in range(6):
        t = d @ CUBEMAP_AXES[f]
        if t > best_t:
            best_t, best_face = t, f
    touching = d * CUBEMAP_AXES[best_face]
    scale_by = touching.sum()
    d = d / scale_by
    t = d @ CUBEMAP_AXES[best_face]
    orth = (d - t * CUBEMAP_AXES[best_face]) * 0.5
    u = orth @ CUBEMAP_AXES[(best_face + 2) % 6]
    v = orth @ CUBEMAP_AXES[(best_face + 4) % 6]
    if best_face % 2 == 1:
        u = -u
    if best_face in (0, 1):
        u, v = v, -u
    elif best_face == 2:
        u, v = -v, u
    elif best_face == 3:
        u, v = -v, u
    elif best_face == 4:
        u, v = -u, -v
    u = min(max(u, -0.5), 0.5)
    v = min(max(v, -0.5), 0.5)
    return best_face, u, v


def c_sample(faces_u8, direction):
    dim = faces_u8.shape[1]
    f, u, v = c_get_skybox_uv(direction)
    ui = int((u + 0.5) * dim)
    vi = int((v + 0.5) * dim)
    ui, vi = min(ui, dim - 1), min(vi, dim - 1)
    return faces_u8[f, vi, ui] / 255.0


def _dir_batch(dirs):
    a = np.asarray(dirs, float)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


class TestFaceSelection:
    def test_axis_directions(self):
        dirs = np.eye(3).tolist() + (-np.eye(3)).tolist()
        want = [0, 2, 4, 1, 3, 5]  # +X,+Y,+Z,-X,-Y,-Z in face order
        face, _, _ = skybox_uv(_dir_batch(dirs))
        np.testing.assert_array_equal(np.asarray(face), want)

    def test_tie_goes_to_first_face(self):
        # equal dots: the C strict-> scan keeps the FIRST max
        d = np.array([[1.0, 1.0, 0.0]])
        face, _, _ = skybox_uv(_dir_batch(d))
        want_face, _, _ = c_get_skybox_uv(d[0])
        assert int(face[0]) == want_face == 0

    def test_random_directions_match_c(self, rng):
        dirs = rng.standard_normal((500, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        face, u, v = skybox_uv(_dir_batch(dirs))
        face, u, v = np.asarray(face), np.asarray(u), np.asarray(v)
        for i in range(len(dirs)):
            wf, wu, wv = c_get_skybox_uv(dirs[i])
            assert face[i] == wf, dirs[i]
            assert u[i] == pytest.approx(wu, abs=1e-13), dirs[i]
            assert v[i] == pytest.approx(wv, abs=1e-13), dirs[i]


class TestTexelFetch:
    def test_colors_faces_solid(self):
        faces = make_colors_skybox(16)
        sky = skybox_from_faces(faces, F64)
        dirs = np.eye(3).tolist() + (-np.eye(3)).tolist()
        got = np.asarray(sample_skybox(sky, _dir_batch(dirs)).to_array())
        want = np.array(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 1, 1], [1, 0, 1], [1, 1, 0]],
            float,
        )
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_uv_checker_matches_c_oracle(self, rng):
        faces = make_uv_checker_skybox(32)
        sky = skybox_from_faces(faces, F64)
        dirs = rng.standard_normal((300, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        got = np.asarray(sample_skybox(sky, _dir_batch(dirs)).to_array())
        want = np.array([c_sample(faces, d) for d in dirs])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_reference_uv_checker_assets(self, reference_available, rng):
        """Same check against the reference's actual shipped uv_checker PPMs
        — validates the PPM reader + sampler against real assets."""
        if not reference_available:
            pytest.skip("reference assets not present")
        from ttrt.assets import load_skybox_faces

        faces = load_skybox_faces("/root/reference/skybox/uv_checker")
        sky = skybox_from_faces(faces, F64)
        dirs = rng.standard_normal((300, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        got = np.asarray(sample_skybox(sky, _dir_batch(dirs)).to_array())
        want = np.array([c_sample(faces, d) for d in dirs])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_bilinear_agrees_on_solid_faces(self):
        # away from face seams, interpolating a solid face is exact
        sky = skybox_from_faces(make_colors_skybox(64), F64)
        dirs = _dir_batch(np.eye(3).tolist() + (-np.eye(3)).tolist())
        near = np.asarray(sample_skybox(sky, dirs, bilinear=False).to_array())
        bil = np.asarray(sample_skybox(sky, dirs, bilinear=True).to_array())
        np.testing.assert_allclose(bil, near, atol=1e-12)

    def test_bilinear_interpolates_gradient(self):
        # +X face with red ramping along the texture row index; sampling at
        # the face center must land mid-ramp (not snap to a texel).
        dim = 32
        faces = np.zeros((6, dim, dim, 3), np.uint8)
        faces[0, :, :, 0] = np.arange(dim, dtype=np.uint8)[None, :] * 8
        sky = skybox_from_faces(faces, F64)
        got = np.asarray(
            sample_skybox(sky, _dir_batch([[1.0, 0.0, 0.0]]), bilinear=True)
            .to_array()
        )[0, 0]
        mid = ((dim // 2 - 1) * 8 + (dim // 2) * 8) / 2.0 / 255.0
        assert got == pytest.approx(mid, abs=1e-12)

    def test_unnormalized_direction_ok(self):
        sky = skybox_from_faces(make_colors_skybox(8), F64)
        got = np.asarray(
            sample_skybox(sky, _dir_batch([[10.0, 0.1, 0.1]])).to_array()
        )
        np.testing.assert_allclose(got[0], [1, 0, 0], atol=1e-12)


class TestDeferredBilinear:
    """The Pallas kernels' deferred 4-tap bilinear machinery
    (render_pallas._sky_texel_index_bilinear + the XLA epilogue's
    neighbor derivation) must reconstruct sample_skybox(bilinear=True)
    BIT-FOR-BIT from (idx00, wu, wv) alone — the kernel emits only those
    three per-ray values. Fast (no Pallas program; pure jnp)."""

    def test_epilogue_reconstructs_oracle(self):
        from ttrt.kernels.render_pallas import (_sky_face_uv_cont,
                                                _sky_texel_index_bilinear)

        dim = 16
        sky = skybox_from_faces(make_uv_checker_skybox(dim), jnp.float32)
        rng = np.random.default_rng(11)
        d = rng.standard_normal((512, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dx = jnp.asarray(d[:, 0], jnp.float32)
        dy = jnp.asarray(d[:, 1], jnp.float32)
        dz = jnp.asarray(d[:, 2], jnp.float32)

        # full-information kernel-side reference: the kernel's own
        # (face, u, v) pushed through sample_skybox(bilinear=True)'s
        # published formulas with NO index compression — any exact
        # mismatch below is a bug in the (idx00, wu, wv) encode/decode,
        # neighbor clamping, or lerp order
        face_r, u_r, v_r = _sky_face_uv_cont(dx, dy, dz)
        fu_r = (u_r + 0.5) * dim - 0.5
        fv_r = (v_r + 0.5) * dim - 0.5
        u0_r = jnp.clip(jnp.floor(fu_r).astype(jnp.int32), 0, dim - 1)
        v0_r = jnp.clip(jnp.floor(fv_r).astype(jnp.int32), 0, dim - 1)
        u1_r = jnp.minimum(u0_r + 1, dim - 1)
        v1_r = jnp.minimum(v0_r + 1, dim - 1)
        wu_r = jnp.clip(fu_r - u0_r.astype(jnp.float32), 0.0, 1.0)
        wv_r = jnp.clip(fv_r - v0_r.astype(jnp.float32), 0.0, 1.0)
        flat_r = sky.packed.reshape(-1)
        base_r = face_r * (dim * dim)

        def tap_r(vi, ui):
            t = jnp.take(flat_r, base_r + vi * dim + ui)
            return (((t >> 16) & 0xFF).astype(jnp.float32) / 255.0,
                    ((t >> 8) & 0xFF).astype(jnp.float32) / 255.0,
                    (t & 0xFF).astype(jnp.float32) / 255.0)

        r00, r01 = tap_r(v0_r, u0_r), tap_r(v0_r, u1_r)
        r10, r11 = tap_r(v1_r, u0_r), tap_r(v1_r, u1_r)
        want = []
        for ch in range(3):
            top = r00[ch] * (1.0 - wu_r) + r01[ch] * wu_r
            bot = r10[ch] * (1.0 - wu_r) + r11[ch] * wu_r
            want.append(np.asarray(top * (1.0 - wv_r) + bot * wv_r))
        want = np.stack(want, axis=-1)

        idx, wu, wv = _sky_texel_index_bilinear(dx, dy, dz, dim)
        # the PRODUCTION epilogue helper (shared by both kernels) must
        # reconstruct the full-info reference from ONLY (idx, wu, wv)
        # + the static dim
        from ttrt.render.skybox import bilinear_from_low_tap

        got = np.stack([
            np.asarray(ch) for ch in bilinear_from_low_tap(
                sky.packed.reshape(-1), idx, wu, wv, dim
            )
        ], axis=-1)
        np.testing.assert_array_equal(got, want.astype(np.float32))

        # and the oracle itself is reproduced to uv-ulp noise: the ONLY
        # permitted difference is the normalize flavor (_normalize3 vs
        # Vec3.normalize — the render-level knife class); values must
        # agree to sub-quantum everywhere
        oracle = np.asarray(sample_skybox(
            sky, Vec3(dx, dy, dz), bilinear=True
        ).to_array())
        np.testing.assert_allclose(got, oracle, atol=2e-5)
        assert (got == oracle.astype(np.float32)).mean() > 0.85

    def test_counter_stream_packing_roundtrip(self):
        # idx00 must survive the kernel's << 10 counter-stream packing
        # for every face/texel at the largest supported dim (591)
        from ttrt.kernels.render_pallas import _sky_texel_index_bilinear

        dim = 591
        assert 6 * dim * dim <= (2**31 - 1) >> 10
        rng = np.random.default_rng(3)
        d = rng.standard_normal((256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        idx, wu, wv = _sky_texel_index_bilinear(
            jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
            jnp.asarray(d[:, 2]), dim,
        )
        idx = np.asarray(idx)
        packed = (idx.astype(np.int32) << 10) | 7  # counters in bits 0..9
        assert (packed >= 0).all()  # no sign-bit overflow
        np.testing.assert_array_equal(packed >> 10, idx)
        assert ((np.asarray(wu) >= 0) & (np.asarray(wu) <= 1)).all()
        assert ((np.asarray(wv) >= 0) & (np.asarray(wv) <= 1)).all()

    @pytest.mark.parametrize("dim", [16, 15])
    def test_quad_fetch_matches_four_gathers(self, dim):
        # The quad-packed single-gather formulation (served when the
        # table is 4-divisible: dim=16) must be bit-identical to the
        # explicit 4-gather form (the fallback, served at dim=15 where
        # 6*dim^2 % 4 == 2) — both against the same hand-rolled taps.
        from ttrt.render.skybox import bilinear_from_low_tap

        rng = np.random.default_rng(5)
        flat = jnp.asarray(
            rng.integers(0, 1 << 24, 6 * dim * dim, dtype=np.int64)
            .astype(np.uint32)
        )
        m = 777
        idx = jnp.asarray(
            rng.integers(0, 6 * dim * dim, m).astype(np.int32))
        # include every group phase and face-edge low corners
        idx = idx.at[:4].set(jnp.arange(4, dtype=jnp.int32))
        idx = idx.at[4].set(6 * dim * dim - 1)  # u0=v0=dim-1: both clamps
        idx = idx.at[5].set(dim - 1)  # u clamp only
        idx = idx.at[6].set((dim - 1) * dim)  # v clamp only
        wu = jnp.asarray(rng.random(m, dtype=np.float32))
        wv = jnp.asarray(rng.random(m, dtype=np.float32))

        got = np.stack([np.asarray(c) for c in
                        bilinear_from_low_tap(flat, idx, wu, wv, dim)], -1)

        fn = np.asarray(flat)
        u0 = np.asarray(idx) % dim
        v0 = (np.asarray(idx) // dim) % dim
        base = np.asarray(idx) - v0 * dim - u0
        u1 = np.minimum(u0 + 1, dim - 1)
        v1 = np.minimum(v0 + 1, dim - 1)

        def tap(vi, ui):
            t = fn[base + vi * dim + ui]
            return np.stack([
                ((t >> 16) & 0xFF).astype(np.float32) / np.float32(255.0),
                ((t >> 8) & 0xFF).astype(np.float32) / np.float32(255.0),
                (t & 0xFF).astype(np.float32) / np.float32(255.0)], -1)

        c00, c01, c10, c11 = tap(v0, u0), tap(v0, u1), tap(v1, u0), tap(v1, u1)
        wuc = np.asarray(wu)[:, None]
        wvc = np.asarray(wv)[:, None]
        want = ((c00 * (1 - wuc) + c01 * wuc) * (1 - wvc)
                + (c10 * (1 - wuc) + c11 * wuc) * wvc)
        np.testing.assert_array_equal(got, want.astype(np.float32))
