"""GJK distance queries + rigid-body stepping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.physics import (
    PhysicsParams,
    PhysicsState,
    gjk_distance,
    physics_step,
    polytope_support,
    sphere_support,
)
from ttrt.physics.world import default_params
from ttrt.vec import Vec3


def _v(arr):
    a = jnp.asarray(arr, jnp.float32)
    return Vec3(a[..., 0], a[..., 1], a[..., 2])


def _box_verts(center, half):
    c = np.asarray(center, np.float32)
    h = np.asarray(half, np.float32)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )
    return (c + corners * h)[None]  # batch of 1


class TestGJKSpheres:
    def test_separated_spheres_exact_distance(self):
        a = sphere_support(_v([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]))
        b = sphere_support(_v([[5.0, 0.0, 0.0]]), jnp.asarray([1.5]))
        dist, n = gjk_distance(a, b, _v([[-5.0, 0.0, 0.0]]))
        np.testing.assert_allclose(float(dist[0]), 5.0 - 2.5, atol=1e-5)
        # normal points from B toward A
        np.testing.assert_allclose(float(n.x[0]), -1.0, atol=1e-5)

    def test_penetrating_spheres_negative(self):
        a = sphere_support(_v([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]))
        b = sphere_support(_v([[1.0, 0.0, 0.0]]), jnp.asarray([1.0]))
        dist, n = gjk_distance(a, b, _v([[-1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(float(dist[0]), -1.0, atol=1e-5)

    def test_batch_of_pairs(self, rng):
        n = 64
        ca = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        cb = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        ra = rng.uniform(0.1, 1.0, n).astype(np.float32)
        rb = rng.uniform(0.1, 1.0, n).astype(np.float32)
        @jax.jit
        def f(ca, cb, ra, rb):
            return gjk_distance(
                sphere_support(_v(ca), ra),
                sphere_support(_v(cb), rb),
                _v(ca - cb),
            )

        dist, _ = f(
            jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(ra), jnp.asarray(rb)
        )
        expect = np.linalg.norm(ca - cb, axis=-1) - ra - rb
        np.testing.assert_allclose(np.asarray(dist), expect, atol=1e-4)


class TestGJKPolytopes:
    def test_separated_boxes(self):
        a = polytope_support(jnp.asarray(_box_verts([0, 0, 0], [1, 1, 1])))
        b = polytope_support(jnp.asarray(_box_verts([4, 0, 0], [1, 1, 1])))
        dist, n = gjk_distance(
            a, b, _v([[-4.0, 0.0, 0.0]])
        )
        np.testing.assert_allclose(float(dist[0]), 2.0, atol=1e-4)

    def test_box_face_vs_vertex_region(self):
        # B offset diagonally: closest feature = corner to corner
        a = polytope_support(jnp.asarray(_box_verts([0, 0, 0], [1, 1, 1])))
        b = polytope_support(jnp.asarray(_box_verts([3, 3, 3], [1, 1, 1])))
        dist, _ = gjk_distance(a, b, _v([[-1.0, -1.0, -1.0]]))
        np.testing.assert_allclose(
            float(dist[0]), np.sqrt(3.0), atol=1e-3
        )

    def test_overlapping_boxes_report_contact(self):
        a = polytope_support(jnp.asarray(_box_verts([0, 0, 0], [1, 1, 1])))
        b = polytope_support(jnp.asarray(_box_verts([1.0, 0, 0], [1, 1, 1])))
        dist, _ = gjk_distance(a, b, _v([[-1.0, 0.0, 0.0]]))
        assert float(dist[0]) <= 1e-3  # touching/penetrating

    def test_sphere_vs_box(self):
        a = sphere_support(_v([[0.0, 5.0, 0.0]]), jnp.asarray([1.0]))
        b = polytope_support(jnp.asarray(_box_verts([0, 0, 0], [2, 2, 2])))
        dist, n = gjk_distance(a, b, _v([[0.0, 5.0, 0.0]]))
        np.testing.assert_allclose(float(dist[0]), 2.0, atol=1e-4)
        np.testing.assert_allclose(float(n.y[0]), 1.0, atol=1e-4)


def _two_sphere_state(dtype=jnp.float32):
    pos = _v([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    vel = _v([[2.0, 0.0, 0.0], [-2.0, 0.0, 0.0]])
    return PhysicsState(pos=pos, vel=vel, t=jnp.asarray(0.0, dtype))


class TestPhysicsStep:
    def test_head_on_collision_reverses(self):
        params = default_params([0.5, 0.5])
        params = params._replace(
            gravity=jnp.zeros(3, jnp.float32),
            restitution=jnp.asarray(1.0, jnp.float32),
        )
        state = _two_sphere_state()
        step = jax.jit(lambda s: physics_step(s, params, 0.01))
        for _ in range(40):  # 0.4 s: they meet at the origin and bounce
            state = step(state)
        assert float(state.vel.x[0]) < 0.0
        assert float(state.vel.x[1]) > 0.0
        # elastic + equal masses: speeds preserved
        np.testing.assert_allclose(
            abs(float(state.vel.x[0])), 2.0, atol=0.05
        )

    def test_no_interpenetration_after_settle(self):
        params = default_params([0.5, 0.5])
        params = params._replace(gravity=jnp.zeros(3, jnp.float32))
        state = _two_sphere_state()
        step = jax.jit(lambda s: physics_step(s, params, 0.01))
        for _ in range(100):
            state = step(state)
        d = np.linalg.norm(
            np.asarray(state.pos.to_array())[0]
            - np.asarray(state.pos.to_array())[1]
        )
        assert d >= 0.99  # >= r1 + r2 (small tolerance)

    def test_ground_bounce_loses_energy(self):
        params = default_params([0.5], restitution=0.5)
        state = PhysicsState(
            pos=_v([[0.0, 2.0, 0.0]]),
            vel=_v([[0.0, 0.0, 0.0]]),
            t=jnp.asarray(0.0, jnp.float32),
        )
        step = jax.jit(lambda s: physics_step(s, params, 1.0 / 120, substeps=2))
        max_y_after_bounce = -10.0
        bounced = False
        for i in range(400):
            state = step(state)
            y = float(state.pos.y[0])
            if bounced:
                max_y_after_bounce = max(max_y_after_bounce, y)
            if not bounced and float(state.vel.y[0]) > 0:
                bounced = True
        assert bounced
        assert max_y_after_bounce < 1.0  # restitution 0.5 -> much lower apex
        assert float(state.pos.y[0]) >= -1.51  # never through the floor

    def test_energy_decreases_with_restitution_lt_1(self):
        params = default_params([0.4, 0.4], restitution=0.6)
        params = params._replace(gravity=jnp.zeros(3, jnp.float32))
        state = _two_sphere_state()

        def ke(s):
            v = np.asarray(s.vel.to_array())
            return float((v ** 2).sum())

        e0 = ke(state)
        step = jax.jit(lambda s: physics_step(s, params, 0.01))
        for _ in range(60):
            state = step(state)
        assert ke(state) < e0 * 0.9

    def test_state_is_checkpointable(self, tmp_path):
        params = default_params([0.5, 0.5])
        state = _two_sphere_state()
        step = jax.jit(lambda s: physics_step(s, params, 0.01))
        for _ in range(10):
            state = step(state)
        # round-trip through flat arrays (the npz checkpoint contract)
        leaves, treedef = jax.tree.flatten(state)
        state2 = jax.tree.unflatten(
            treedef, [jnp.asarray(np.asarray(l)) for l in leaves]
        )
        a = physics_step(state, params, 0.01)
        b = physics_step(state2, params, 0.01)
        np.testing.assert_array_equal(
            np.asarray(a.pos.to_array()), np.asarray(b.pos.to_array())
        )


class TestObstacles:
    """Static convex obstacles via the general GJK query in the stepping
    loop (box hulls)."""

    def test_sphere_rests_on_box(self):
        from ttrt.physics.world import box_obstacle

        params = default_params(
            [0.5], restitution=0.3,
            obstacles=box_obstacle([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
        )
        state = PhysicsState(
            pos=_v([[0.0, 3.0, 0.0]]),
            vel=_v([[0.0, 0.0, 0.0]]),
            t=jnp.asarray(0.0, jnp.float32),
        )
        step = jax.jit(lambda s: physics_step(s, params, 1.0 / 120,
                                              substeps=2))
        for _ in range(400):
            state = step(state)
        # box top face at y=1, sphere radius 0.5 -> rest near y=1.5
        y = float(state.pos.y[0])
        assert 1.3 < y < 1.7, y
        assert abs(float(state.vel.y[0])) < 0.5

    def test_sphere_deflects_off_box_side(self):
        from ttrt.physics.world import box_obstacle

        params = default_params(
            [0.3], restitution=0.9,
            obstacles=box_obstacle([2.0, 0.0, 0.0], [0.5, 5.0, 5.0]),
        )
        params = params._replace(gravity=jnp.zeros(3, jnp.float32))
        state = PhysicsState(
            pos=_v([[0.0, 0.0, 0.0]]),
            vel=_v([[3.0, 0.0, 0.0]]),
            t=jnp.asarray(0.0, jnp.float32),
        )
        step = jax.jit(lambda s: physics_step(s, params, 0.01))
        for _ in range(120):
            state = step(state)
        assert float(state.vel.x[0]) < 0.0  # bounced back
        assert float(state.pos.x[0]) < 1.2  # never tunneled through
