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
