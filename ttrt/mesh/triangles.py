"""Triangle primitives: SoA batch + branch-free batched intersection.

The reference has no triangle path — "other shapes for objects" is a
roadmap item (README.md:19). This is a from-scratch TPU-first design:
the Moller-Trumbore test vectorizes as pure VPU arithmetic over the ray
batch with masked selects, sharing the epsilon conventions of the
reference's plane test (TerminalRayTracer.c:680,685): reject near-parallel
rays via |det| <= 1e-5 and near-origin hits via t <= 1e-5.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ttrt.config import constants
from ttrt.scene import Materials
from ttrt.vec import Vec3


class Triangles(NamedTuple):
    """SoA triangle batch: vertices (M,) per component + per-triangle
    material. The geometric normal is PRECOMPUTED (normalize(cross(e1, e2)))
    at build time — it is constant per triangle, so recomputing it per
    ray-test would waste VPU cycles and gather bandwidth."""

    v0: Vec3
    e1: Vec3  # v1 - v0
    e2: Vec3  # v2 - v0
    normal: Vec3  # unit geometric normal
    material: Materials

    @property
    def count(self) -> int:
        return self.v0.x.shape[-1]

    @staticmethod
    def create_np(vertices, colors, reflectivity, specularity=100.0):
        """Host-side precompute: vertices (M, 3, 3) -> dict of float64
        arrays (v0/e1/e2/normal (M,3), color (M,3), refl/spec (M,)).
        Kept separate from device upload so grid/cluster builders can
        consume the NumPy data directly — a device->host fetch costs up
        to ~90 s per buffer on remote-tunnel backends."""
        v = np.asarray(vertices, np.float64)
        v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
        e1 = v1 - v0
        e2 = v2 - v0
        n = np.cross(e1, e2)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        n = n / np.where(norm == 0.0, 1.0, norm)
        m = v.shape[0]
        return {
            "v0": v0, "e1": e1, "e2": e2, "normal": n,
            "color": np.broadcast_to(np.asarray(colors, np.float64),
                                     (m, 3)),
            "reflectivity": np.broadcast_to(np.asarray(reflectivity), m),
            "specularity": np.broadcast_to(np.asarray(specularity), m),
        }

    @staticmethod
    def from_np(h, dtype=jnp.float32) -> "Triangles":
        """Upload a create_np() dict (one transfer per leaf)."""
        def vec(arr):
            return Vec3(*(jnp.asarray(arr[:, i], dtype) for i in range(3)))

        return Triangles(
            v0=vec(h["v0"]),
            e1=vec(h["e1"]),
            e2=vec(h["e2"]),
            normal=vec(h["normal"]),
            material=Materials(
                color=vec(h["color"]),
                reflectivity=jnp.asarray(h["reflectivity"], dtype),
                specularity=jnp.asarray(h["specularity"], dtype),
            ),
        )

    @staticmethod
    def create(vertices, colors, reflectivity, specularity=100.0,
               dtype=jnp.float32) -> "Triangles":
        """vertices: (M, 3, 3) — M triangles x 3 corners x xyz."""
        return Triangles.from_np(
            Triangles.create_np(vertices, colors, reflectivity,
                                specularity),
            dtype,
        )

    def aabbs(self) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side per-triangle AABBs for the grid build. NOTE: reads
        the device arrays back (slow on tunnel backends) — builders that
        have the NumPy data should use aabbs_np instead."""
        v0 = np.stack([np.asarray(c) for c in self.v0], -1)
        v1 = v0 + np.stack([np.asarray(c) for c in self.e1], -1)
        v2 = v0 + np.stack([np.asarray(c) for c in self.e2], -1)
        return Triangles._aabbs_from(v0, v1, v2)

    @staticmethod
    def aabbs_np(h) -> Tuple[np.ndarray, np.ndarray]:
        """AABBs straight from a create_np() dict (no device fetch)."""
        v0 = h["v0"]
        return Triangles._aabbs_from(v0, v0 + h["e1"], v0 + h["e2"])

    @staticmethod
    def _aabbs_from(v0, v1, v2):
        lo = np.minimum(np.minimum(v0, v1), v2)
        hi = np.maximum(np.maximum(v0, v1), v2)
        return lo, hi


def ray_triangle(o: Vec3, d: Vec3, v0: Vec3, e1: Vec3, e2: Vec3):
    """Moller-Trumbore over a ray batch against ONE triangle (components may
    be scalars or per-lane gathers). Returns (t, hit_mask); t is garbage
    where hit is False."""
    p = d.cross(e2)
    det = e1.dot(p)
    ok = jnp.abs(det) > constants.PLANE_DENOM_EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    s = o - v0
    u = s.dot(p) * inv
    q = s.cross(e1)
    v = d.dot(q) * inv
    t = e2.dot(q) * inv
    hit = (
        ok
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > constants.PLANE_T_EPS)
    )
    return t, hit


def floor_mesh_np(
    y: float = -2.0,
    half_extent: float = 20.0,
    cells: int = 16,
    even_color=(1.0, 1.0, 1.0),
    odd_color=(1.0, 0.0, 0.0),
    reflectivity: float = 0.2,
) -> dict:
    """Host-side floor mesh data (see floor_mesh)."""
    xs = np.linspace(-half_extent, half_extent, cells + 1)
    zs = np.linspace(-half_extent, half_extent, cells + 1)
    tris = []
    cols = []
    for i in range(cells):
        for j in range(cells):
            x0, x1 = xs[i], xs[i + 1]
            z0, z1 = zs[j], zs[j + 1]
            a = (x0, y, z0)
            b = (x1, y, z0)
            c = (x1, y, z1)
            dd = (x0, y, z1)
            # wind CCW seen from +y so the precomputed normal points up
            tris.append((a, c, b))
            tris.append((a, dd, c))
            parity = (int(np.floor(x0)) + int(np.floor(z0))) & 1
            col = odd_color if parity else even_color
            cols.append(col)
            cols.append(col)
    return Triangles.create_np(
        np.asarray(tris), np.asarray(cols), reflectivity, 100.0
    )


def floor_mesh(
    y: float = -2.0,
    half_extent: float = 20.0,
    cells: int = 16,
    even_color=(1.0, 1.0, 1.0),
    odd_color=(1.0, 0.0, 0.0),
    reflectivity: float = 0.2,
    dtype=jnp.float32,
) -> Triangles:
    """Checkerboard floor as a triangle mesh: cells x cells quads, 2 CCW-up
    triangles each, colored by the same floor(x)+floor(z) parity rule as the
    reference's infinite plane (TerminalRayTracer.c:850) evaluated at the
    cell corner."""
    return Triangles.from_np(
        floor_mesh_np(y, half_extent, cells, even_color, odd_color,
                      reflectivity),
        dtype,
    )
