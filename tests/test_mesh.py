"""Many-object tier: triangles, uniform grid, grid-vs-brute parity,
end-to-end render through the shared integrator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.mesh import (
    MeshScene,
    Triangles,
    UniformGrid,
    build_grid,
    floor_mesh,
    many_sphere_scene,
    trace_ray_mesh,
)
from ttrt.mesh.scene import trace_ray_mesh_brute
from ttrt.mesh.triangles import ray_triangle
from ttrt.render.integrator import render_frame
from ttrt.scene import HIT_NONE, HIT_SPHERE, HIT_TRIANGLE
from ttrt.vec import Vec3


def _vec(arrs):
    a = jnp.asarray(arrs, jnp.float32)
    return Vec3(a[..., 0], a[..., 1], a[..., 2])


def _unit_tri(dtype=jnp.float32):
    return Triangles.create(
        np.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]),
        np.array([[1.0, 0.0, 0.0]]),
        0.5,
        dtype=dtype,
    )


class TestRayTriangle:
    def test_direct_hit(self):
        tri = _unit_tri()
        o = _vec([[0.25, 0.25, 1.0]])
        d = _vec([[0.0, 0.0, -1.0]])
        v0 = Vec3(tri.v0.x[0], tri.v0.y[0], tri.v0.z[0])
        e1 = Vec3(tri.e1.x[0], tri.e1.y[0], tri.e1.z[0])
        e2 = Vec3(tri.e2.x[0], tri.e2.y[0], tri.e2.z[0])
        t, hit = ray_triangle(o, d, v0, e1, e2)
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)

    def test_outside_barycentric_misses(self):
        tri = _unit_tri()
        v0 = Vec3(tri.v0.x[0], tri.v0.y[0], tri.v0.z[0])
        e1 = Vec3(tri.e1.x[0], tri.e1.y[0], tri.e1.z[0])
        e2 = Vec3(tri.e2.x[0], tri.e2.y[0], tri.e2.z[0])
        # past the hypotenuse: u+v > 1
        o = _vec([[0.9, 0.9, 1.0]])
        d = _vec([[0.0, 0.0, -1.0]])
        _, hit = ray_triangle(o, d, v0, e1, e2)
        assert not bool(hit[0])
        # parallel ray rejected by the det epsilon
        o = _vec([[0.25, 0.25, 1.0]])
        d = _vec([[1.0, 0.0, 0.0]])
        _, hit = ray_triangle(o, d, v0, e1, e2)
        assert not bool(hit[0])

    def test_behind_origin_misses(self):
        tri = _unit_tri()
        v0 = Vec3(tri.v0.x[0], tri.v0.y[0], tri.v0.z[0])
        e1 = Vec3(tri.e1.x[0], tri.e1.y[0], tri.e1.z[0])
        e2 = Vec3(tri.e2.x[0], tri.e2.y[0], tri.e2.z[0])
        o = _vec([[0.25, 0.25, -1.0]])
        d = _vec([[0.0, 0.0, -1.0]])  # triangle is behind
        _, hit = ray_triangle(o, d, v0, e1, e2)
        assert not bool(hit[0])


class TestFloorMesh:
    def test_normals_point_up(self):
        tris = floor_mesh(cells=4)
        np.testing.assert_allclose(np.asarray(tris.normal.y), 1.0, atol=1e-6)

    def test_counts(self):
        tris = floor_mesh(cells=4)
        assert tris.count == 4 * 4 * 2


def _random_mesh_scene(n=200, seed=3):
    skybox = skybox_from_faces(make_colors_skybox(16), jnp.float32)
    return many_sphere_scene(
        skybox, n_spheres=n, width_px=32, height_px=16, seed=seed,
        floor_cells=4,
    )


class TestGridTraversal:
    def test_grid_matches_brute_force(self, rng):
        scene = _random_mesh_scene()
        n_rays = 512
        o = _vec(rng.uniform(-18, 18, (n_rays, 3)).astype(np.float32))
        # pull origins up so many rays see floor + spheres
        o = Vec3(o.x, jnp.abs(o.y) + 0.5, o.z)
        d_raw = rng.normal(size=(n_rays, 3)).astype(np.float32)
        # random rays hit small spheres only by luck (a handful in 512);
        # AIM the last 64 at random sphere centers so the sphere branch is
        # genuinely exercised regardless of rng draw order
        centers = np.stack(
            [np.asarray(v, np.float64) for v in scene.spheres.center], -1
        )
        pick = rng.integers(0, centers.shape[0], 64)
        on = np.stack([np.asarray(v) for v in o], -1)
        d_raw[-64:] = (centers[pick] - on[-64:]).astype(np.float32)
        d = _vec(d_raw).normalize()

        hit_g = jax.jit(
            lambda s, o, d: trace_ray_mesh(s, o, d, sample_sky=False)
        )(scene, o, d)
        hit_b = jax.jit(
            lambda s, o, d: trace_ray_mesh_brute(s, o, d, sample_sky=False)
        )(scene, o, d)

        np.testing.assert_array_equal(
            np.asarray(hit_g.kind), np.asarray(hit_b.kind)
        )
        for a, b in zip(hit_g.point, hit_b.point):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )
        for a, b in zip(hit_g.normal, hit_b.normal):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )
        np.testing.assert_allclose(
            np.asarray(hit_g.material.reflectivity),
            np.asarray(hit_b.material.reflectivity),
            atol=1e-6,
        )
        # sanity: the batch actually exercises all three outcomes
        kinds = set(np.asarray(hit_g.kind).tolist())
        assert HIT_SPHERE in kinds and HIT_TRIANGLE in kinds

    def test_moving_spheres_trace_correctly(self, rng):
        """with_spheres drops the now-stale grid so animated geometry
        routes to the dense tester on EVERY backend (a stale grid can
        silently miss a sphere that moved out of its rasterized cells).
        Moving every sphere far from its build position must still trace
        exactly like the brute-force oracle."""
        scene = _random_mesh_scene(n=64)
        assert scene.grid is not None
        sph = scene.spheres
        moved = sph._replace(
            center=Vec3(sph.center.x + 7.5, sph.center.y + 3.0,
                        sph.center.z - 6.0)
        )
        scene2 = scene.with_spheres(moved)
        assert scene2.grid is None  # acceleration invalidated, not stale

        n_rays = 256
        o = _vec(rng.uniform(-18, 18, (n_rays, 3)).astype(np.float32))
        o = Vec3(o.x, jnp.abs(o.y) + 0.5, o.z)
        d = _vec(rng.normal(size=(n_rays, 3)).astype(np.float32)).normalize()

        hit = jax.jit(
            lambda s, o, d: trace_ray_mesh(s, o, d, sample_sky=False)
        )(scene2, o, d)
        hit_b = jax.jit(
            lambda s, o, d: trace_ray_mesh_brute(s, o, d, sample_sky=False)
        )(scene2, o, d)
        np.testing.assert_array_equal(
            np.asarray(hit.kind), np.asarray(hit_b.kind)
        )
        # dense restructures the quadratic (c = o.o - 2 C.O + (|C|^2-r^2)
        # vs the oracle's |o-C|^2 - r^2): equal in R, a few ulps apart in
        # f32, and the gap scales with |t| — so the point compare must be
        # relative (f32 eps at t~15 is already ~1e-3 absolute).
        for a, b in zip(hit.point, hit_b.point):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=2e-4)
        kinds = set(np.asarray(hit.kind).tolist())
        assert HIT_SPHERE in kinds  # moved spheres are actually being hit

    def test_down_ray_hits_floor(self):
        scene = _random_mesh_scene(n=2)
        o = _vec([[0.0, 5.0, 0.0]])
        d = _vec([[0.0, -1.0, 0.0]])
        hit = trace_ray_mesh(scene, o, d, sample_sky=False)
        # y=5 straight down: either the floor (y=-2) or a sphere in between
        assert int(hit.kind[0]) != HIT_NONE

    def test_escaping_ray_misses(self):
        scene = _random_mesh_scene(n=2)
        o = _vec([[0.0, 30.0, 0.0]])
        d = _vec([[0.0, 1.0, 0.0]])
        hit = trace_ray_mesh(scene, o, d, sample_sky=False)
        assert int(hit.kind[0]) == HIT_NONE


class TestGridBuild:
    def test_every_object_is_in_some_cell(self):
        scene = _random_mesh_scene(n=50)
        cells = np.asarray(scene.grid.cells)
        present = set(cells[cells >= 0].tolist())
        n_total = scene.spheres.count + scene.triangles.count
        assert present == set(range(n_total))

    def test_explicit_resolution(self):
        skybox = skybox_from_faces(make_colors_skybox(8), jnp.float32)
        scene = many_sphere_scene(
            skybox, n_spheres=10, width_px=8, height_px=8,
            grid_resolution=(4, 2, 4), floor_cells=2,
        )
        assert scene.grid.dims == (4, 2, 4)


class TestEndToEnd:
    def test_render_frame_mesh_scene(self):
        scene = _random_mesh_scene(n=64)
        cfg = RenderConfig(
            width=32, height=16, rays_per_pixel=2, bounce_limit=4,
            dtype=jnp.float32,
        )
        fb, rays = jax.jit(
            lambda s: render_frame(s, cfg, count_rays=True)
        )(scene)
        for c in fb:
            arr = np.asarray(c)
            assert arr.shape == (16, 32)
            assert np.isfinite(arr).all()
            assert (arr >= 0).all() and (arr <= 1).all()
        assert int(rays) > 0


class TestDensePath:
    """The dense blocked tester (TPU production path) must agree with the
    grid traversal and the brute oracle."""

    def test_dense_matches_brute(self, rng):
        from ttrt.mesh.dense import dense_nearest

        scene = _random_mesh_scene(n=300, seed=9)
        n_rays = 256
        o = _vec(rng.uniform(-18, 18, (n_rays, 3)).astype(np.float32))
        o = Vec3(o.x, jnp.abs(o.y) + 0.5, o.z)
        d = _vec(rng.normal(size=(n_rays, 3)).astype(np.float32)).normalize()

        gh_d = jax.jit(
            lambda s, o, d: dense_nearest(s.spheres, s.triangles, o, d)
        )(scene, o, d)
        hit_b = jax.jit(
            lambda s, o, d: trace_ray_mesh_brute(s, o, d, sample_sky=False)
        )(scene, o, d)
        # reconstruct brute's raw (t, obj): compare hit kinds and distances
        from ttrt.mesh.scene import _finish_hit

        hit_d = _finish_hit(scene, o, d, gh_d, False, False)
        np.testing.assert_array_equal(
            np.asarray(hit_d.kind), np.asarray(hit_b.kind)
        )
        for a, b in zip(hit_d.point, hit_b.point):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            )
        np.testing.assert_allclose(
            np.asarray(hit_d.material.reflectivity),
            np.asarray(hit_b.material.reflectivity),
            atol=1e-6,
        )

    def test_dense_single_sphere_and_inside(self):
        """Edge cases: one-object scene (padding dominates the chunk) and a
        ray starting INSIDE a sphere (c<0 -> no hit, like the reference's
        nearer-root-only rule)."""
        from ttrt.mesh.dense import dense_nearest
        from ttrt.scene import Spheres, Materials

        spheres = Spheres(
            center=_vec([[0.0, 0.0, 0.0]]),
            radius=jnp.asarray([1.0], jnp.float32),
            material=Materials.create(
                np.array([[1.0, 0.0, 0.0]]), 0.5
            ),
        )
        o = _vec([[0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
        d = _vec([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
        gh = dense_nearest(spheres, None, o, d)
        t = np.asarray(gh.t)
        obj = np.asarray(gh.obj)
        np.testing.assert_allclose(t[0], 4.0, atol=1e-5)  # outside hit
        assert obj[0] == 0
        assert obj[1] == -1  # inside: nearer root behind -> miss
        assert obj[2] == -1  # perpendicular miss

    def test_dense_triangles_only(self):
        from ttrt.mesh.dense import dense_nearest

        tris = floor_mesh(y=0.0, half_extent=2.0, cells=2)
        o = _vec([[0.5, 3.0, 0.5]])
        d = _vec([[0.0, -1.0, 0.0]])
        gh = dense_nearest(None, tris, o, d)
        np.testing.assert_allclose(float(gh.t[0]), 3.0, atol=1e-5)
        assert int(gh.obj[0]) >= 0
