"""Lighting tests incl. the reference's quirks
(apply_lighting, TerminalRayTracer.c:891-963)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.render.intersect import trace_ray
from ttrt.render.lighting import apply_lighting
from ttrt.scene import (
    DirectionalLights,
    PointLights,
    demo_scene,
)
from ttrt.vec import Vec3, vec3

F64 = jnp.float64


def V(x, y, z):
    return vec3(np.float64(x), np.float64(y), np.float64(z))


@pytest.fixture()
def scene():
    sky = skybox_from_faces(make_colors_skybox(8), F64)
    return demo_scene(sky, 480, 280, F64)


def _no_directional(scene):
    return scene._replace(
        directional_lights=DirectionalLights(
            direction=Vec3(jnp.zeros((0,), F64), jnp.zeros((0,), F64), jnp.zeros((0,), F64)),
            color=Vec3(jnp.zeros((0,), F64), jnp.zeros((0,), F64), jnp.zeros((0,), F64)),
        )
    )


def _no_point(scene):
    return scene._replace(
        point_lights=PointLights(
            position=Vec3(jnp.zeros((0,), F64), jnp.zeros((0,), F64), jnp.zeros((0,), F64)),
            color=Vec3(jnp.zeros((0,), F64), jnp.zeros((0,), F64), jnp.zeros((0,), F64)),
            intensity=jnp.zeros((0,), F64),
        )
    )


class TestDirectional:
    def test_unblocked_diffuse(self, scene):
        s = _no_point(scene)
        # point high above ground, upward normal; light dir (-1,-1,-1) ->
        # ldir = normalize(1,1,1); n.l = 1/sqrt(3)
        p, n = V(20.0, -1.9999, 20.0), V(0, 1, 0)
        out = apply_lighting(s, p, V(0, 1, 0), n, V(1.0, 1.0, 1.0))
        want = 1.0 / np.sqrt(3.0)
        np.testing.assert_allclose(
            np.asarray(out.to_array()), [want] * 3, rtol=1e-12
        )

    def test_blocked_by_any_hit(self, scene):
        s = _no_point(scene)
        # pick p so the shadow ray along +(1,1,1)/sqrt3 passes straight
        # through the +y sphere's center -> blocked -> fully dark.
        u = 1.0 / np.sqrt(3.0)
        p = V(0.0 - 2 * u, 1.0 - 2 * u, 0.0 - 2 * u)
        out = apply_lighting(s, p, V(0, 1, 0), V(0, 1, 0), V(1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out.to_array()), [0.0] * 3)

    def test_negative_ndotl_darkens_then_clamps(self, scene):
        # n.l is NOT clamped below 0 (TerminalRayTracer.c:911): a back-facing
        # normal gives a negative diffuse term; with only one light the final
        # [0,1] clamp floors it at 0.
        s = _no_point(scene)
        p = V(20.0, -1.9999, 20.0)
        out = apply_lighting(s, p, V(0, 1, 0), V(0, -1, 0), V(1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out.to_array()), [0.0] * 3)


class TestPointLight:
    def test_inverse_square_with_clamp(self, scene):
        s = _no_directional(scene)
        # light at origin intensity 10: closer than sqrt(10) m the clamp
        # saturates intensity at 1 (TerminalRayTracer.c:931)
        p, n = V(0.0, -0.6, 0.0), V(0, -1, 0)  # under -y sphere? ensure no blocker:
        # use a point 5 m out on +x axis just above ground with clear LoS
        p, n = V(5.0, 0.0, 0.0), V(1, 0, 0)
        # shadow ray from p toward origin... hits the +x sphere -> blocked;
        # but light distance (5) < blocker distance? blocker at x=1.5 from p
        # -> dist 3.5 < 5 -> light NOT closer -> dark.
        out = apply_lighting(s, p, n, n, V(1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out.to_array()), [0.0] * 3)

    def test_light_closer_than_blocker_is_lit(self, scene):
        # The reference treats the light as visible when light-dist^2 <
        # blocker-dist^2 (TerminalRayTracer.c:942). Put the surface point
        # inside the sphere ring: shadow ray toward origin passes THROUGH
        # the scene center (no object between p and origin); trace hits the
        # far sphere beyond the light -> lit.
        s = _no_directional(scene)
        p, n = V(0.0, 0.45, 0.0), V(0, -1, 0)
        # actually p just below +y sphere surface, normal down toward light
        out = apply_lighting(s, p, n, n, V(1.0, 1.0, 1.0))
        arr = np.asarray(out.to_array())
        # intensity clamp: dist 0.45 -> I=10/0.2025 -> clamped 1; n.l = 1
        np.testing.assert_allclose(arr, [1.0] * 3, rtol=1e-12)

    def test_miss_shadow_ray_is_lit(self, scene):
        # point above the ring looking up: shadow ray down toward origin is
        # clear of spheres? from (0,3,0) toward origin hits +y sphere at
        # y=1.5 -> blocked and closer... use a far lateral point instead
        s = _no_directional(scene)
        p, n = V(0.0, 0.0, 0.45), V(0, 0, -1)
        out = apply_lighting(s, p, n, n, V(1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(out.to_array()), [1.0] * 3, rtol=1e-12)

    def test_result_overwrites_material_color_scaling(self, scene):
        # colored material multiplies pointwise (TerminalRayTracer.c:953)
        s = _no_directional(scene)
        p, n = V(0.0, 0.0, 0.45), V(0, 0, -1)
        out = apply_lighting(s, p, n, n, V(0.25, 0.5, 1.0))
        np.testing.assert_allclose(
            np.asarray(out.to_array()), [0.25, 0.5, 1.0], rtol=1e-12
        )


class TestClampAccumulation:
    def test_multi_light_sum_clamped_to_one(self, scene):
        # both lights lit at full strength -> sum > 1 -> clamp to 1
        p, n = V(0.0, 0.45, 0.0), V(0, 1, 0)
        # directional from (1,1,1): shadow ray up from inside ring clears
        out = apply_lighting(scene, p, n, n, V(1.0, 1.0, 1.0))
        arr = np.asarray(out.to_array())
        assert np.all(arr <= 1.0)
