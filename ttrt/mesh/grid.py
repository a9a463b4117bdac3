"""Uniform-grid acceleration structure + batched 3D-DDA traversal.

Design rationale (TPU-first; reference roadmap item "hierarchy to
accelerate raytracing", TerminalRayTracer.c:30): a BVH traversal needs a
per-ray stack and highly divergent control flow — poison for a lockstep
vector machine. A uniform grid instead gives:

  - a FIXED-SHAPE cell table ``(Gx, Gy, Gz, K)`` of object indices
    (-1 padded): every lookup is a static-size gather, every cell visit
    tests exactly K slots with masked lanes — no stacks, no divergence,
    XLA-friendly shapes throughout;
  - 3D-DDA marching as one whole-batch ``lax.while_loop``: each iteration
    is (gather K candidates) -> (K masked primitive tests) -> (advance one
    cell). Rays terminate when their best hit lies inside the cell interval
    just marched or the ray leaves the grid; the loop ends when all lanes
    are done.

The grid is built on host (NumPy) at scene-construction time — it is
static geometry setup, not per-frame work. Sphere/triangle indices share
one table: ids in [0, n_spheres) are spheres, [n_spheres, n_spheres+M) are
triangles.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.mesh.triangles import Triangles, ray_triangle
from ttrt.scene import Spheres
from ttrt.vec import Vec3


class UniformGrid(NamedTuple):
    """Cell table + world-space placement. ``cells`` is (Gx, Gy, Gz, K)
    int32 (-1 = empty slot) — the dims live in the SHAPE, so they stay
    static under jit without non-array pytree leaves."""

    cells: jnp.ndarray  # (Gx, Gy, Gz, K) int32
    origin: Vec3  # scalar components: AABB min corner
    cell_size: Vec3  # scalar components

    @property
    def dims(self) -> Tuple[int, int, int]:
        return self.cells.shape[0], self.cells.shape[1], self.cells.shape[2]

    @property
    def capacity(self) -> int:
        return self.cells.shape[3]


def build_grid(
    spheres: Optional[Spheres],
    triangles: Optional[Triangles],
    resolution: Optional[Tuple[int, int, int]] = None,
    dtype=jnp.float32,
    *,
    np_spheres: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    np_tris: Optional[dict] = None,
) -> UniformGrid:
    """Host-side grid build: rasterize every object's AABB into the cell
    table. Resolution defaults to ~cbrt(n_objects) cells per axis scaled by
    the scene AABB aspect ratio (the classic grid heuristic), clamped to
    [1, 64] per axis. Capacity K grows to the fullest cell.

    ``np_spheres`` ((n,3) centers, (n,) radii) / ``np_tris``
    (Triangles.create_np dict) supply the geometry as host arrays —
    REQUIRED for fast builds on tunnel backends where each device->host
    fetch of the device leaves can cost ~90 s."""
    lo_list, hi_list = [], []
    n_spheres = 0
    if spheres is not None and spheres.count:
        n_spheres = spheres.count
        if np_spheres is not None:
            c = np.asarray(np_spheres[0], np.float64)
            r = np.asarray(np_spheres[1], np.float64)[:, None]
        else:
            c = np.stack(
                [np.asarray(v, np.float64) for v in spheres.center], -1
            )
            r = np.asarray(spheres.radius, np.float64)[:, None]
        lo_list.append(c - r)
        hi_list.append(c + r)
    if triangles is not None and triangles.count:
        if np_tris is not None:
            tlo, thi = triangles.aabbs_np(np_tris)
        else:
            tlo, thi = triangles.aabbs()
        lo_list.append(tlo)
        hi_list.append(thi)
    if not lo_list:
        raise ValueError("grid build needs at least one object")

    lo = np.concatenate(lo_list)
    hi = np.concatenate(hi_list)
    n_obj = lo.shape[0]

    world_lo = lo.min(axis=0) - 1e-4
    world_hi = hi.max(axis=0) + 1e-4
    extent = np.maximum(world_hi - world_lo, 1e-6)

    if resolution is None:
        target = max(1.0, float(n_obj) ** (1.0 / 3.0))
        geo_mean = float(np.exp(np.log(extent).mean()))
        dims = np.clip(
            np.round(target * extent / geo_mean).astype(int), 1, 64
        )
        resolution = (int(dims[0]), int(dims[1]), int(dims[2]))
    gx, gy, gz = resolution
    cell = extent / np.array([gx, gy, gz], np.float64)

    # rasterize AABBs -> cell index ranges
    lo_idx = np.clip(((lo - world_lo) / cell).astype(int), 0,
                     np.array([gx - 1, gy - 1, gz - 1]))
    hi_idx = np.clip(((hi - world_lo) / cell).astype(int), 0,
                     np.array([gx - 1, gy - 1, gz - 1]))

    buckets: dict = {}
    for obj in range(n_obj):
        x0, y0, z0 = lo_idx[obj]
        x1, y1, z1 = hi_idx[obj]
        for ix in range(x0, x1 + 1):
            for iy in range(y0, y1 + 1):
                for iz in range(z0, z1 + 1):
                    buckets.setdefault((ix, iy, iz), []).append(obj)

    k = max((len(v) for v in buckets.values()), default=1)
    cells = np.full((gx, gy, gz, k), -1, np.int32)
    for (ix, iy, iz), objs in buckets.items():
        cells[ix, iy, iz, : len(objs)] = objs

    return UniformGrid(
        cells=jnp.asarray(cells),
        origin=Vec3(*(jnp.asarray(v, dtype) for v in world_lo)),
        cell_size=Vec3(*(jnp.asarray(v, dtype) for v in cell)),
    )


class GridHit(NamedTuple):
    """Raw nearest-hit from traversal: t (inf on miss), object id (-1 on
    miss). Attribute fetch (normal/material) happens once per ray AFTER
    traversal — one gather instead of per-cell-visit gathers."""

    t: jnp.ndarray
    obj: jnp.ndarray  # int32 global object id


def _safe_inv(x):
    """1/x with +/-inf preserved and 0 -> huge (DDA treats the axis as
    never-crossing)."""
    big = jnp.asarray(3.0e37, x.dtype)
    return jnp.where(jnp.abs(x) > 1e-30, 1.0 / jnp.where(x == 0, 1.0, x),
                     jnp.where(x >= 0, big, -big))


def traverse_grid(
    grid: UniformGrid,
    spheres: Optional[Spheres],
    triangles: Optional[Triangles],
    o: Vec3,
    d: Vec3,
) -> GridHit:
    """Batched 3D-DDA: march every ray through the cell table, testing the
    K candidate objects of each visited cell with masked lanes. Nearest-hit
    by ray parameter t (equivalent to the reference's squared-distance
    compare for a common origin)."""
    dtype = o.x.dtype
    shape = o.x.shape
    gx, gy, gz = grid.dims
    K = grid.capacity
    n_spheres = spheres.count if spheres is not None else 0

    # PACKED attribute rows: every per-candidate fetch inside the march is
    # a ROW gather (take axis=0) instead of per-component element gathers —
    # XLA lowers element gathers to ~8 ns each, which made the traversal
    # gather-bound; row gathers amortize like embedding lookups. The packing
    # stacks are loop-invariant, so XLA hoists them out of the while_loop.
    cells_rows = grid.cells.reshape(-1, K)  # (n_cells, K)
    if n_spheres:
        sph_rows = jnp.stack(
            [spheres.center.x, spheres.center.y, spheres.center.z,
             spheres.radius],
            axis=-1,
        )  # (N, 4)
    if triangles is not None and triangles.count:
        tri_rows = jnp.stack(
            [triangles.v0.x, triangles.v0.y, triangles.v0.z,
             triangles.e1.x, triangles.e1.y, triangles.e1.z,
             triangles.e2.x, triangles.e2.y, triangles.e2.z],
            axis=-1,
        )  # (M, 9)
    inv_dx = _safe_inv(d.x)
    inv_dy = _safe_inv(d.y)
    inv_dz = _safe_inv(d.z)

    # ray/AABB slab clip to the grid bounds
    wlo = grid.origin
    whi = Vec3(
        grid.origin.x + grid.cell_size.x * gx,
        grid.origin.y + grid.cell_size.y * gy,
        grid.origin.z + grid.cell_size.z * gz,
    )
    t1x, t2x = (wlo.x - o.x) * inv_dx, (whi.x - o.x) * inv_dx
    t1y, t2y = (wlo.y - o.y) * inv_dy, (whi.y - o.y) * inv_dy
    t1z, t2z = (wlo.z - o.z) * inv_dz, (whi.z - o.z) * inv_dz
    t_enter = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    t_exit = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    t_start = jnp.maximum(t_enter, 0.0)
    misses_box = t_exit < t_start

    # entry cell
    px = o.x + t_start * d.x
    py = o.y + t_start * d.y
    pz = o.z + t_start * d.z
    ix = jnp.clip(((px - wlo.x) / grid.cell_size.x).astype(jnp.int32), 0, gx - 1)
    iy = jnp.clip(((py - wlo.y) / grid.cell_size.y).astype(jnp.int32), 0, gy - 1)
    iz = jnp.clip(((pz - wlo.z) / grid.cell_size.z).astype(jnp.int32), 0, gz - 1)

    step_x = jnp.where(d.x > 0, 1, jnp.where(d.x < 0, -1, 0)).astype(jnp.int32)
    step_y = jnp.where(d.y > 0, 1, jnp.where(d.y < 0, -1, 0)).astype(jnp.int32)
    step_z = jnp.where(d.z > 0, 1, jnp.where(d.z < 0, -1, 0)).astype(jnp.int32)

    tdelta_x = jnp.abs(grid.cell_size.x * inv_dx)
    tdelta_y = jnp.abs(grid.cell_size.y * inv_dy)
    tdelta_z = jnp.abs(grid.cell_size.z * inv_dz)

    def boundary(i, stp, lo_w, csize, inv):
        nxt = i + jnp.maximum(stp, 0)  # next boundary index along the axis
        return (lo_w + nxt.astype(dtype) * csize - _axis_o) * inv

    # tmax: t at the first boundary crossing per axis
    _axis_o = o.x
    tmax_x = jnp.where(step_x == 0, jnp.inf,
                       boundary(ix, step_x, wlo.x, grid.cell_size.x, inv_dx))
    _axis_o = o.y
    tmax_y = jnp.where(step_y == 0, jnp.inf,
                       boundary(iy, step_y, wlo.y, grid.cell_size.y, inv_dy))
    _axis_o = o.z
    tmax_z = jnp.where(step_z == 0, jnp.inf,
                       boundary(iz, step_z, wlo.z, grid.cell_size.z, inv_dz))

    inf = jnp.full(shape, jnp.inf, dtype)
    max_steps = gx + gy + gz + 2

    class Carry(NamedTuple):
        n: jnp.ndarray
        ix: jnp.ndarray
        iy: jnp.ndarray
        iz: jnp.ndarray
        tmax_x: jnp.ndarray
        tmax_y: jnp.ndarray
        tmax_z: jnp.ndarray
        best_t: jnp.ndarray
        best_obj: jnp.ndarray
        active: jnp.ndarray

    def cond(c: Carry):
        return (c.n < max_steps) & jnp.any(c.active)

    def body(c: Carry) -> Carry:
        cell_id = (c.ix * gy + c.iy) * gz + c.iz
        slots = jnp.take(cells_rows, cell_id, axis=0)  # (rays, K) row gather
        best_t, best_obj = c.best_t, c.best_obj

        for slot in range(K):
            obj = slots[..., slot]
            valid = c.active & (obj >= 0)
            if n_spheres:
                sidx = jnp.clip(obj, 0, n_spheres - 1)
                srow = jnp.take(sph_rows, sidx, axis=0)  # (rays, 4)
                cx, cy, cz, r = (srow[..., i] for i in range(4))
                ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
                a = d.dot(d)
                b = 2.0 * (ocx * d.x + ocy * d.y + ocz * d.z)
                cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - 4.0 * a * cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t0 = (-b - sq) / (2.0 * a)
                s_hit = (disc >= 0.0) & (t0 > 0.0)
                take_s = valid & (obj < n_spheres) & s_hit & (t0 < best_t)
                best_t = jnp.where(take_s, t0, best_t)
                best_obj = jnp.where(take_s, obj, best_obj)
            if triangles is not None and triangles.count:
                tidx = jnp.clip(obj - n_spheres, 0, triangles.count - 1)
                trow = jnp.take(tri_rows, tidx, axis=0)  # (rays, 9)
                v0 = Vec3(trow[..., 0], trow[..., 1], trow[..., 2])
                e1 = Vec3(trow[..., 3], trow[..., 4], trow[..., 5])
                e2 = Vec3(trow[..., 6], trow[..., 7], trow[..., 8])
                tt, t_hit = ray_triangle(o, d, v0, e1, e2)
                take_t = valid & (obj >= n_spheres) & t_hit & (tt < best_t)
                best_t = jnp.where(take_t, tt, best_t)
                best_obj = jnp.where(take_t, obj, best_obj)

        # march: cross the nearest cell boundary
        t_cell_exit = jnp.minimum(jnp.minimum(c.tmax_x, c.tmax_y), c.tmax_z)
        # done if the best hit is inside the cell just tested, or the ray
        # leaves the grid at this boundary
        found = best_t <= t_cell_exit
        go_x = (c.tmax_x <= c.tmax_y) & (c.tmax_x <= c.tmax_z)
        go_y = ~go_x & (c.tmax_y <= c.tmax_z)
        go_z = ~go_x & ~go_y

        nix = jnp.where(go_x, c.ix + step_x, c.ix)
        niy = jnp.where(go_y, c.iy + step_y, c.iy)
        niz = jnp.where(go_z, c.iz + step_z, c.iz)
        out = (
            (nix < 0) | (nix >= gx) | (niy < 0) | (niy >= gy)
            | (niz < 0) | (niz >= gz) | (t_cell_exit > t_exit)
        )
        active = c.active & ~found & ~out

        return Carry(
            n=c.n + 1,
            ix=jnp.clip(nix, 0, gx - 1),
            iy=jnp.clip(niy, 0, gy - 1),
            iz=jnp.clip(niz, 0, gz - 1),
            tmax_x=jnp.where(go_x, c.tmax_x + tdelta_x, c.tmax_x),
            tmax_y=jnp.where(go_y, c.tmax_y + tdelta_y, c.tmax_y),
            tmax_z=jnp.where(go_z, c.tmax_z + tdelta_z, c.tmax_z),
            best_t=best_t,
            best_obj=best_obj,
            active=active,
        )

    init = Carry(
        n=jnp.zeros((), jnp.int32),
        ix=ix, iy=iy, iz=iz,
        tmax_x=tmax_x, tmax_y=tmax_y, tmax_z=tmax_z,
        best_t=inf,
        best_obj=jnp.full(shape, -1, jnp.int32),
        active=~misses_box,
    )
    out = jax.lax.while_loop(cond, body, init)
    hit_ok = jnp.isfinite(out.best_t)
    return GridHit(
        t=jnp.where(hit_ok, out.best_t, jnp.inf),
        obj=jnp.where(hit_ok, out.best_obj, -1),
    )
