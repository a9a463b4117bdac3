"""Intersection and nearest-hit traversal tests
(reference: TerminalRayTracer.c:635-889)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.render.intersect import (
    nearest_hit_raw,
    ray_plane_t,
    ray_sphere_t0,
    trace_ray,
)
from ttrt.scene import (
    HIT_GROUND,
    HIT_NONE,
    HIT_SPHERE,
    demo_scene,
)
from ttrt.vec import vec3


F64 = jnp.float64


def V(x, y, z):
    return vec3(np.float64(x), np.float64(y), np.float64(z))


@pytest.fixture(scope="module")
def scene():
    sky = skybox_from_faces(make_colors_skybox(16), F64)
    return demo_scene(sky, 480, 280, F64)


class TestRaySphere:
    def test_through_center(self):
        o, d = V(0, 0, 5), V(0, 0, -1)
        t0, hit = ray_sphere_t0(o, d, V(0, 0, 0), jnp.float64(1.0))
        assert bool(hit) and float(t0) == pytest.approx(4.0, abs=1e-12)

    def test_tangent_discriminant_zero_hits(self):
        # grazing ray: disc == 0 still counts (>= 0 in c:651)
        o, d = V(1.0, 0, 5), V(0, 0, -1)
        t0, hit = ray_sphere_t0(o, d, V(0, 0, 0), jnp.float64(1.0))
        assert bool(hit)
        assert float(t0) == pytest.approx(5.0, abs=1e-6)

    def test_behind_origin_rejected(self):
        o, d = V(0, 0, 5), V(0, 0, 1)  # sphere is behind
        _, hit = ray_sphere_t0(o, d, V(0, 0, 0), jnp.float64(1.0))
        assert not bool(hit)

    def test_origin_inside_sphere_near_root_negative(self):
        # from inside, t0 (near root) is negative -> NO hit, matching the
        # reference's t0-only check (TerminalRayTracer.c:657-670).
        o, d = V(0, 0, 0), V(0, 0, -1)
        _, hit = ray_sphere_t0(o, d, V(0, 0, 0), jnp.float64(1.0))
        assert not bool(hit)

    def test_miss_no_nan(self):
        o, d = V(5, 5, 5), V(0, 1, 0)
        t0, hit = ray_sphere_t0(o, d, V(0, 0, 0), jnp.float64(1.0))
        assert not bool(hit) and not np.isnan(float(t0))


class TestRayPlane:
    PT, N = V(0, -2, 0), V(0, 1, 0)

    def test_hit_from_above(self):
        t, hit = ray_plane_t(V(0, 0, 0), V(0, -1, 0), self.PT, self.N)
        assert bool(hit) and float(t) == pytest.approx(2.0)

    def test_parallel_rejected_by_denom_eps(self):
        # |denom| <= 1e-5 rejected (TerminalRayTracer.c:680)
        _, hit = ray_plane_t(V(0, 0, 0), V(1, 1e-6, 0), self.PT, self.N)
        assert not bool(hit)
        _, hit2 = ray_plane_t(V(0, 0, 0), V(1, -2e-5, 0), self.PT, self.N)
        assert bool(hit2)

    def test_t_eps_rejects_near_zero(self):
        # t <= 1e-5 rejected (TerminalRayTracer.c:685)
        o = V(0, -2.0 + 0.5e-5, 0)
        _, hit = ray_plane_t(o, V(0, -1, 0), self.PT, self.N)
        assert not bool(hit)

    def test_pointing_away_rejected(self):
        _, hit = ray_plane_t(V(0, 0, 0), V(0, 1, 0), self.PT, self.N)
        assert not bool(hit)


class TestNearestHit:
    def test_nearest_of_two_spheres(self, scene):
        # from +x looking -x: hits the +x sphere (red) first
        o, d = V(5, 0, 0), V(-1, 0, 0)
        best = nearest_hit_raw(scene, o, d)
        assert int(best.kind) == HIT_SPHERE
        np.testing.assert_allclose(
            np.asarray(best.point.to_array()), [1.5, 0, 0], atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(best.color.to_array()), [1, 0, 0], atol=0
        )

    def test_ground_checker_parity_incl_negatives(self, scene):
        # checker = (int)(floor(x)+floor(z)) & 1 (TerminalRayTracer.c:850)
        cases = [
            ((0.5, 0.5), 0),    # floor 0 + 0 = 0 -> even
            ((1.5, 0.5), 1),    # 1 + 0 -> odd
            ((-0.5, 0.5), 1),   # -1 + 0 = -1 -> & 1 == 1 (two's complement)
            ((-0.5, -0.5), 0),  # -1 + -1 = -2 -> even
            ((-1.5, 0.5), 0),   # -2 + 0 -> even
        ]
        for (x, z), want_odd in cases:
            o, d = V(x, 0, z), V(0, -1, 0)
            best = nearest_hit_raw(scene, o, d)
            assert int(best.kind) == HIT_GROUND
            color = np.asarray(best.color.to_array())
            want = [1, 0, 0] if want_odd else [1, 1, 1]
            np.testing.assert_allclose(color, want, err_msg=f"{x=} {z=}")

    def test_sphere_shadows_ground(self, scene):
        # straight down through the -y sphere: sphere is closer than ground
        o, d = V(0, 5, 0), V(0, -1, 0)
        best = nearest_hit_raw(scene, o, d)
        assert int(best.kind) == HIT_SPHERE

    def test_miss_semantics(self, scene):
        o, d = V(0, 5, 0), V(0, 1, 0)  # straight up: only sky
        hit = trace_ray(scene, o, d)
        assert int(hit.kind) == HIT_NONE
        # miss: point = ray origin, normal = normalized dir, refl = 0
        np.testing.assert_allclose(np.asarray(hit.point.to_array()), [0, 5, 0])
        np.testing.assert_allclose(np.asarray(hit.normal.to_array()), [0, 1, 0])
        assert float(hit.material.reflectivity) == 0.0
        # +Y face of the colors skybox is green
        np.testing.assert_allclose(
            np.asarray(hit.material.color.to_array()), [0, 1, 0], atol=1e-12
        )

    def test_epsilon_back_offset(self, scene):
        o, d = V(0, 0, 5), V(0, 0, -1)
        hit = trace_ray(scene, o, d)
        assert int(hit.kind) == HIT_SPHERE
        # hit at z=1.5 pushed back toward origin by EPSILON
        assert float(hit.point.z) == pytest.approx(1.5 + 1e-6, abs=1e-12)

    def test_normal_normalized(self, scene):
        o, d = V(0, 0, 5), V(0, 0, -1)
        hit = trace_ray(scene, o, d)
        n = np.asarray(hit.normal.to_array())
        assert np.linalg.norm(n) == pytest.approx(1.0, abs=1e-12)
        np.testing.assert_allclose(n, [0, 0, 1], atol=1e-9)


class TestManySpheresScanPath:
    def test_scan_matches_unrolled(self, rng):
        """The lax.scan chunked path (>16 spheres) must agree with the
        unrolled path on an identical scene."""
        from ttrt.scene import Materials, Plane, Scene, Spheres
        from ttrt.vec import Vec3

        n = 37  # odd, not a chunk multiple -> exercises padding
        centers = rng.uniform(-3, 3, (n, 3))
        radii = rng.uniform(0.1, 0.6, n)
        colors = rng.uniform(0, 1, (n, 3))

        def build(nsub):
            return Spheres.create(
                centers[:nsub], radii[:nsub], colors[:nsub], 0.5, 100.0, F64
            )

        sky = skybox_from_faces(make_colors_skybox(8), F64)
        base = demo_scene(sky, 64, 64, F64)

        big = base._replace(spheres=build(n))
        o = vec3(
            jnp.asarray(rng.uniform(-5, 5, 50)),
            jnp.asarray(rng.uniform(-5, 5, 50)),
            jnp.asarray(rng.uniform(4, 6, 50)),
        )
        d = vec3(
            jnp.asarray(rng.uniform(-1, 1, 50)),
            jnp.asarray(rng.uniform(-1, 1, 50)),
            jnp.asarray(-np.ones(50)),
        ).normalize()

        got = nearest_hit_raw(big, o, d)

        # oracle: brute-force python over the same spheres via tiny batches
        import ttrt.render.intersect as ix

        old = ix._UNROLL_LIMIT
        ix._UNROLL_LIMIT = 64  # force unrolled path
        try:
            want = nearest_hit_raw(big, o, d)
        finally:
            ix._UNROLL_LIMIT = old

        np.testing.assert_array_equal(np.asarray(got.kind), np.asarray(want.kind))
        np.testing.assert_allclose(
            np.asarray(got.point.to_array()),
            np.asarray(want.point.to_array()),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(got.color.to_array()),
            np.asarray(want.color.to_array()),
            atol=0,
        )
