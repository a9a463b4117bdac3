"""Frame/rotation composition tests against literal scalar transcriptions
of the reference's (idiosyncratic) matrix conventions
(TerminalRayTracer.c:557-624, 1326-1336)."""

import numpy as np
import jax.numpy as jnp

from ttrt.config import constants
from ttrt.frames import (
    Frame,
    orbit_camera_frame,
    rotate_basis,
    rotate_basis_x,
    rotate_basis_y,
    rotate_basis_z,
    transform_frame,
)


# --- scalar oracles: direct transcriptions of the C ------------------------

def c_rotate_basis(basis: np.ndarray, rotation: np.ndarray) -> np.ndarray:
    """TerminalRayTracer.c:558-573: result[i][j] = basis_row_i . rotation_row_j."""
    out = np.empty((3, 3))
    for i in range(3):
        for j in range(3):
            out[i, j] = basis[i] @ rotation[j]
    return out


def c_rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], float)


def c_rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], float)


def c_rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], float)


def c_transform_frame(fb, fo, tb, to):
    """TerminalRayTracer.c:607-624."""
    rb = np.empty((3, 3))
    for i in range(3):
        for j in range(3):
            rb[i, j] = sum(fb[i, k] * tb[k, j] for k in range(3))
    ro = np.array([sum(fo[k] * tb[k, j] for k in range(3)) + to[j] for j in range(3)])
    return rb, ro


def test_rotate_basis_matches_c(rng):
    for _ in range(20):
        b = rng.standard_normal((3, 3))
        r = rng.standard_normal((3, 3))
        got = np.asarray(rotate_basis(jnp.asarray(b), jnp.asarray(r)))
        np.testing.assert_allclose(got, c_rotate_basis(b, r), atol=1e-12)


def test_axis_rotations_match_c(rng):
    for _ in range(10):
        b = rng.standard_normal((3, 3))
        a = rng.uniform(-10, 10)
        np.testing.assert_allclose(
            np.asarray(rotate_basis_x(jnp.asarray(b), a)),
            c_rotate_basis(b, c_rot_x(a)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(rotate_basis_y(jnp.asarray(b), a)),
            c_rotate_basis(b, c_rot_y(a)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(rotate_basis_z(jnp.asarray(b), a)),
            c_rotate_basis(b, c_rot_z(a)), atol=1e-12)


def test_transform_frame_matches_c(rng):
    for _ in range(20):
        fb = rng.standard_normal((3, 3))
        fo = rng.standard_normal(3)
        tb = rng.standard_normal((3, 3))
        to = rng.standard_normal(3)
        got = transform_frame(
            Frame(jnp.asarray(fb), jnp.asarray(fo)),
            Frame(jnp.asarray(tb), jnp.asarray(to)),
        )
        want_b, want_o = c_transform_frame(fb, fo, tb, to)
        np.testing.assert_allclose(np.asarray(got.basis), want_b, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.origin), want_o, atol=1e-12)


def test_orbit_camera_matches_c_sequence():
    """Replicate main's camera construction step by step
    (TerminalRayTracer.c:1326-1336) and compare."""
    for t in [0.0, 0.5, 1.0, 3.7, 12.34]:
        b0 = np.eye(3)
        b0 = c_rotate_basis(b0, c_rot_x(2 * constants.PI * t * -0.03))
        b0 = c_rotate_basis(b0, c_rot_y(2 * constants.PI * t * 0.05))
        cam_b = np.eye(3)
        cam_o = np.zeros(3)
        cam_b, cam_o = c_transform_frame(
            cam_b, cam_o, np.eye(3), np.array([0.0, 0.0, 1.99])
        )
        cam_b, cam_o = c_transform_frame(cam_b, cam_o, b0, np.zeros(3))

        got = orbit_camera_frame(t, jnp.float64)
        np.testing.assert_allclose(np.asarray(got.basis), cam_b, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got.origin), cam_o, atol=1e-12)
        # camera must stay on the 1.99 m orbit
        assert abs(np.linalg.norm(np.asarray(got.origin)) - 1.99) < 1e-12
