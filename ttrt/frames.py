"""Reference frames: bases, rotations, rigid-transform composition.

A ``Basis`` is stored as a row-major 3x3 matrix whose ROWS are the frame's
x/y/z axis vectors — exactly the reference's ``Basis{Vector x,y,z}`` layout
(TerminalRayTracer.c:91-97). These are tiny per-frame host-or-device
computations (a handful of scalars), not hot-path code, so clarity and exact
behavioral parity win over vectorization here.

The reference's composition conventions are idiosyncratic and are preserved
verbatim because camera animation parity depends on them:

  - ``rotate_basis(B, R)`` computes ``B @ R.T`` — it dots basis rows with
    rotation ROWS (TerminalRayTracer.c:557-573). With the standard rotation
    matrices it passes (TerminalRayTracer.c:576-603), the effective applied
    rotation is by ``-angle``.
  - ``transform_frame(F, T)`` is a row-vector homogeneous compose:
    ``basis' = F.basis @ T.basis`` and ``origin' = F.origin @ T.basis +
    T.origin`` (TerminalRayTracer.c:605-624).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ttrt.config import constants
from ttrt.vec import Vec3


class Frame(NamedTuple):
    """Rigid frame: ``basis`` is a (..., 3, 3) row-major matrix with rows =
    axis vectors; ``origin`` is a (..., 3) point (TerminalRayTracer.c:99-104)."""

    basis: jnp.ndarray
    origin: jnp.ndarray

    @staticmethod
    def identity(dtype=jnp.float64) -> "Frame":
        """Default orientation + zero origin (TerminalRayTracer.c:289-296)."""
        return Frame(jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype=dtype))

    @property
    def x_axis(self) -> Vec3:
        return Vec3(self.basis[..., 0, 0], self.basis[..., 0, 1], self.basis[..., 0, 2])

    @property
    def y_axis(self) -> Vec3:
        return Vec3(self.basis[..., 1, 0], self.basis[..., 1, 1], self.basis[..., 1, 2])

    @property
    def z_axis(self) -> Vec3:
        return Vec3(self.basis[..., 2, 0], self.basis[..., 2, 1], self.basis[..., 2, 2])

    @property
    def origin_vec(self) -> Vec3:
        return Vec3(self.origin[..., 0], self.origin[..., 1], self.origin[..., 2])


def rotate_basis(basis: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """``result[i][j] = basis_row_i . rotation_row_j`` = ``B @ R.T``
    (TerminalRayTracer.c:557-573). precision=HIGHEST: on TPU the default
    may run f32 matmuls as one bf16 MXU pass; the camera basis feeds every
    primary ray, so it must carry full f32 (the 3x3 cost is nil)."""
    return jnp.matmul(basis, rotation.T,
                      precision=jax.lax.Precision.HIGHEST)


def _rx(angle, dtype):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones((), dtype), jnp.zeros((), dtype)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, c, -s]),
            jnp.stack([zero, s, c]),
        ]
    ).astype(dtype)


def _ry(angle, dtype):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones((), dtype), jnp.zeros((), dtype)
    return jnp.stack(
        [
            jnp.stack([c, zero, s]),
            jnp.stack([zero, one, zero]),
            jnp.stack([-s, zero, c]),
        ]
    ).astype(dtype)


def _rz(angle, dtype):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones((), dtype), jnp.zeros((), dtype)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero]),
            jnp.stack([s, c, zero]),
            jnp.stack([zero, zero, one]),
        ]
    ).astype(dtype)


def rotate_basis_x(basis: jnp.ndarray, angle) -> jnp.ndarray:
    """TerminalRayTracer.c:575-583."""
    angle = jnp.asarray(angle, basis.dtype)
    return rotate_basis(basis, _rx(angle, basis.dtype))


def rotate_basis_y(basis: jnp.ndarray, angle) -> jnp.ndarray:
    """TerminalRayTracer.c:585-593."""
    angle = jnp.asarray(angle, basis.dtype)
    return rotate_basis(basis, _ry(angle, basis.dtype))


def rotate_basis_z(basis: jnp.ndarray, angle) -> jnp.ndarray:
    """TerminalRayTracer.c:595-603."""
    angle = jnp.asarray(angle, basis.dtype)
    return rotate_basis(basis, _rz(angle, basis.dtype))


def transform_frame(frame: Frame, transform: Frame) -> Frame:
    """Row-vector homogeneous composition (TerminalRayTracer.c:605-624):
    ``basis' = F @ T``; ``origin' = origin @ T + T.origin``. Full-f32
    matmul precision for the same reason as rotate_basis."""
    hp = jax.lax.Precision.HIGHEST
    return Frame(
        basis=jnp.matmul(frame.basis, transform.basis, precision=hp),
        origin=jnp.matmul(frame.origin, transform.basis, precision=hp)
        + transform.origin,
    )


def orbit_camera_frame(t, dtype=jnp.float64) -> Frame:
    """The demo's per-frame camera pose as a pure function of elapsed seconds
    (TerminalRayTracer.c:1326-1336): the camera orbits the origin at radius
    1.99 m, spun by Rx(2*pi*t*-0.03) then Ry(2*pi*t*0.05) through the
    reference's transposed `rotate_basis`.

    Being a pure function of ``t`` makes animation state trivially
    checkpointable/resumable and jit-safe (no host clock inside the trace).
    """
    t = jnp.asarray(t, dtype)
    two_pi = jnp.asarray(2.0 * constants.PI, dtype)
    b0 = jnp.eye(3, dtype=dtype)
    b0 = rotate_basis_x(b0, two_pi * t * (-0.03))
    b0 = rotate_basis_y(b0, two_pi * t * 0.05)
    tf0 = Frame(b0, jnp.zeros((3,), dtype))
    tf1 = Frame(jnp.eye(3, dtype=dtype), jnp.array([0.0, 0.0, 1.99], dtype))
    cam = Frame.identity(dtype)
    cam = transform_frame(cam, tf1)
    cam = transform_frame(cam, tf0)
    return cam
