"""Struct-of-arrays 3-vector math.

TPU-first layout decision: a batch of N 3-vectors is stored as three
independent ``(N,)`` (or any-shaped) arrays rather than one ``(N, 3)``
array. Elementwise vector algebra then maps 1:1 onto full-width VPU lanes
(8x128 per op) with no 3-wide minor dimension wasting 125/128 lanes, and
XLA fuses whole expression chains into single loops over HBM.

Semantics mirror the reference vector library (TerminalRayTracer.c:438-546,
626-633), including its quirks:
  - ``normalize`` is a NO-OP when the length is <= 1e-4
    (TerminalRayTracer.c:444) — preserved for bit parity.
  - ``clamp``/``clamp3`` match the min-then-max branch order
    (TerminalRayTracer.c:523-530).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ttrt.config import constants


class Vec3(NamedTuple):
    """Three same-shaped arrays acting as a batch of 3-vectors.

    Being a NamedTuple it is automatically a JAX pytree, so Vec3 values can
    flow through jit / vmap / scan / shard_map unchanged.
    """

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- constructors -------------------------------------------------------
    @staticmethod
    def create(x, y, z, dtype=None) -> "Vec3":
        if dtype is not None:
            return Vec3(
                jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)
            )
        return Vec3(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))

    @staticmethod
    def from_array(a: jnp.ndarray) -> "Vec3":
        """From a trailing-dim-3 array (host/interop convenience)."""
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def full_like(v: "Vec3", x, y, z) -> "Vec3":
        return Vec3(
            jnp.full_like(v.x, x), jnp.full_like(v.y, y), jnp.full_like(v.z, z)
        )

    def to_array(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # -- algebra -------------------------------------------------------------
    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, o) -> "Vec3":
        """Pointwise vector*vector (TerminalRayTracer.c:515) or vector*scalar
        (TerminalRayTracer.c:467)."""
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def dot(self, o: "Vec3") -> jnp.ndarray:
        """TerminalRayTracer.c:461-464."""
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_sq(self) -> jnp.ndarray:
        return self.dot(self)

    def length(self) -> jnp.ndarray:
        return jnp.sqrt(self.length_sq())

    def normalize(self) -> "Vec3":
        """Guarded normalize: identity when length <= 1e-4
        (TerminalRayTracer.c:439-450)."""
        length = self.length()
        ok = length > jnp.asarray(constants.NORMALIZE_GUARD, length.dtype)
        inv = jnp.where(ok, 1.0 / jnp.where(ok, length, 1.0), 1.0)
        return Vec3(self.x * inv, self.y * inv, self.z * inv)

    def reflect(self, normal: "Vec3") -> "Vec3":
        """v - 2 (v.n) n (TerminalRayTracer.c:626-633)."""
        d = 2.0 * self.dot(normal)
        return Vec3(
            self.x - d * normal.x, self.y - d * normal.y, self.z - d * normal.z
        )

    def clamp(self, lo, hi) -> "Vec3":
        """Per-component clamp (TerminalRayTracer.c:532-538)."""
        return Vec3(
            jnp.clip(self.x, lo, hi), jnp.clip(self.y, lo, hi), jnp.clip(self.z, lo, hi)
        )

    def where(self, mask, other: "Vec3") -> "Vec3":
        """Select self where mask else other — the masked-lane analog of the
        reference's divergent branches."""
        return Vec3(
            jnp.where(mask, self.x, other.x),
            jnp.where(mask, self.y, other.y),
            jnp.where(mask, self.z, other.z),
        )

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))

    @property
    def shape(self):
        return jnp.shape(self.x)

    @property
    def dtype(self):
        return jnp.result_type(self.x)


def vec3(x, y, z, dtype=None) -> Vec3:
    """Scalar/array constructor with optional dtype cast."""
    if dtype is None:
        return Vec3(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    return Vec3(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)
    )


def clamp(value, lo, hi):
    """Scalar clamp matching TerminalRayTracer.c:523-530 (min wins, then max)."""
    return jnp.minimum(jnp.maximum(value, lo), hi)


def triangle_wave(t):
    """Period-2*pi triangle wave in [0, 1]: 0->0, pi/2->1 ... the reference's
    deterministic AA jitter source (TerminalRayTracer.c:225-228)."""
    two_pi = 2.0 * constants.PI
    m = jnp.mod(t, two_pi)
    return jnp.where(m < constants.PI, m / constants.PI, 2.0 - m / constants.PI)
