"""Unit tests for the SoA vector core (reference semantics:
TerminalRayTracer.c:438-546, 626-633, 225-228)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.config import constants
from ttrt.vec import Vec3, clamp, triangle_wave, vec3


def V(x, y, z):
    return vec3(
        np.asarray(x, np.float64), np.asarray(y, np.float64), np.asarray(z, np.float64)
    )


class TestNormalize:
    def test_unit_result(self):
        v = V(3.0, 4.0, 0.0).normalize()
        np.testing.assert_allclose(
            np.asarray(v.to_array()), [0.6, 0.8, 0.0], rtol=1e-15
        )

    def test_guard_noop_below_threshold(self):
        # normalize is a NO-OP for length <= 1e-4 (TerminalRayTracer.c:444)
        v = V(5e-5, 0.0, 0.0).normalize()
        assert float(v.x) == 5e-5

    def test_guard_boundary(self):
        # length exactly 1e-4 is NOT normalized (strict >)
        v = V(1e-4, 0.0, 0.0).normalize()
        assert float(v.x) == 1e-4
        v2 = V(1.0001e-4, 0.0, 0.0).normalize()
        assert float(v2.x) == pytest.approx(1.0, rel=1e-12)

    def test_zero_vector_no_nan(self):
        v = V(0.0, 0.0, 0.0).normalize()
        assert not np.any(np.isnan(np.asarray(v.to_array())))


class TestAlgebra:
    def test_dot_cross(self):
        a, b = V(1.0, 2.0, 3.0), V(4.0, -5.0, 6.0)
        assert float(a.dot(b)) == 4 - 10 + 18
        c = a.cross(b)
        np.testing.assert_allclose(np.asarray(c.to_array()), [27.0, 6.0, -13.0])

    def test_reflect(self):
        # v - 2(v.n)n (TerminalRayTracer.c:626-633)
        v = V(1.0, -1.0, 0.0)
        n = V(0.0, 1.0, 0.0)
        r = v.reflect(n)
        np.testing.assert_allclose(np.asarray(r.to_array()), [1.0, 1.0, 0.0])

    def test_pointwise_mul_and_scalar(self):
        a = V(1.0, 2.0, 3.0)
        np.testing.assert_allclose(
            np.asarray((a * a).to_array()), [1.0, 4.0, 9.0]
        )
        np.testing.assert_allclose(
            np.asarray((2.0 * a).to_array()), [2.0, 4.0, 6.0]
        )

    def test_batched_shapes(self):
        a = Vec3(jnp.ones((7,)), jnp.zeros((7,)), jnp.ones((7,)))
        assert a.normalize().x.shape == (7,)
        assert a.dot(a).shape == (7,)


class TestClamp:
    def test_scalar_semantics(self):
        assert float(clamp(jnp.float64(-0.5), 0.0, 1.0)) == 0.0
        assert float(clamp(jnp.float64(1.5), 0.0, 1.0)) == 1.0
        assert float(clamp(jnp.float64(0.25), 0.0, 1.0)) == 0.25

    def test_vector_clamp(self):
        v = V(-1.0, 0.5, 2.0).clamp(0.0, 1.0)
        np.testing.assert_allclose(np.asarray(v.to_array()), [0.0, 0.5, 1.0])


class TestTriangleWave:
    def test_reference_anchor_points(self):
        # t=0->0, pi/2->1/2? No: tri(t) = t/pi on [0,pi): pi/2 -> 0.5.
        # Reference doc comment says pi/2->1 but the CODE gives 0.5; we match
        # the code (TerminalRayTracer.c:225-228).
        pi = constants.PI
        for t, want in [
            (0.0, 0.0),
            (pi / 2, 0.5),
            (pi, 1.0),
            (3 * pi / 2, 0.5),
            (2 * pi, 0.0),
            (2 * pi + pi / 2, 0.5),
        ]:
            got = float(triangle_wave(jnp.float64(t)))
            assert got == pytest.approx(want, abs=1e-12), t

    def test_matches_c_formula(self, rng):
        # direct transcription of the C expression as oracle
        def c_tri(t):
            m = np.fmod(t, 2 * constants.PI)
            return m / constants.PI if m < constants.PI else 2 - m / constants.PI

        ts = rng.uniform(0, 50, 100)
        got = np.asarray(triangle_wave(jnp.asarray(ts)))
        want = np.array([c_tri(t) for t in ts])
        np.testing.assert_allclose(got, want, atol=1e-14)
