"""The reflectivity mixing models (cfg.energy_model).

"parity" is the reference's accumulation (TerminalRayTracer.c:1034-1061):
full contribution-weighted shading each bounce, normalized by the
accumulated contribution total. "subtract" is the reference's OWN roadmap
model (TerminalRayTracer.c:24-28): "make reflectivity subtract from the
color that a ray sees. i.e. 100% reflectivity means the ray doesn't see
that object's color at all. 0% reflectivity means the ray sees that
object's color * the lighting" — local shading weighted by
(1 - reflectivity), the continuation carrying the rest, no normalization
(path weights partition unity; truncated energy is absorbed).

Fast tests pin the model's defining properties on the f64 oracle; the
slow (interpret-mode) tests hold BOTH production Pallas kernels to the
usual quantized-exactness-off-knife-edges bar against the oracle running
the same model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knife_util import assert_quantized_exact_off_knife
from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import ConfigError, RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.render.integrator import render_frame
from ttrt.scene import demo_scene


def _setup(dtype=jnp.float64, t=0.7, energy_model="subtract",
           procedural="colors", width=48, height=28):
    cfg = RenderConfig(
        width=width, height=height, rays_per_pixel=2, bounce_limit=10,
        dtype=dtype, energy_model=energy_model,
    )
    scene = demo_scene(
        skybox_from_faces(make_colors_skybox(16), dtype,
                          procedural=procedural),
        cfg.width, cfg.height, dtype,
    )
    frame = jax.tree.map(
        lambda a: a.astype(dtype), orbit_camera_frame(t, dtype)
    )
    return scene.with_camera_frame(frame), cfg


def _with_refl(scene, value):
    """Every material's reflectivity set to ``value``."""
    def set_m(m):
        return m._replace(
            reflectivity=jnp.full_like(m.reflectivity, value)
        )

    return scene._replace(
        spheres=scene.spheres._replace(
            material=set_m(scene.spheres.material)
        ),
        ground=scene.ground._replace(
            even_material=set_m(scene.ground.even_material),
            odd_material=set_m(scene.ground.odd_material),
        ),
    )


def _with_sphere_color(scene, i, rgb):
    m = scene.spheres.material
    col = m.color
    col = type(col)(
        col.x.at[i].set(rgb[0]),
        col.y.at[i].set(rgb[1]),
        col.z.at[i].set(rgb[2]),
    )
    return scene._replace(
        spheres=scene.spheres._replace(material=m._replace(color=col))
    )


def test_config_rejects_unknown_model():
    with pytest.raises(ConfigError):
        RenderConfig(energy_model="bogus")


def test_subtract_equals_parity_at_zero_reflectivity():
    """With every reflectivity 0 the two models are THE SAME function:
    parity's total is exactly 1 (one bounce) and subtract's weight is
    exactly (1 - 0) — outputs must agree bit-for-bit."""
    scene, cfg = _setup(energy_model="parity")
    scene = _with_refl(scene, 0.0)
    fb_p, _ = render_frame(scene, cfg)
    fb_s, _ = render_frame(scene, cfg.with_(energy_model="subtract"))
    np.testing.assert_array_equal(
        np.asarray(fb_p.to_array()), np.asarray(fb_s.to_array())
    )


def test_mirror_sphere_own_color_invisible():
    """The roadmap TODO's defining sentence (TerminalRayTracer.c:25-26):
    at reflectivity 1.0 the ray "doesn't see that object's color at
    all". Demo sphere 0 (+x) has reflectivity 1.0 — recoloring it must
    leave the subtract-model image EXACTLY unchanged (its local shading
    carries weight 1-1=0; no other term reads its color), while the
    parity model shows the change (sanity: the sphere is in view)."""
    scene, cfg = _setup(energy_model="subtract")
    recolored = _with_sphere_color(scene, 0, (0.0, 1.0, 0.0))  # red->green

    fb_a, _ = render_frame(scene, cfg)
    fb_b, _ = render_frame(recolored, cfg)
    np.testing.assert_array_equal(
        np.asarray(fb_a.to_array()), np.asarray(fb_b.to_array())
    )

    cfg_p = cfg.with_(energy_model="parity")
    fb_pa, _ = render_frame(scene, cfg_p)
    fb_pb, _ = render_frame(recolored, cfg_p)
    assert np.abs(
        np.asarray(fb_pa.to_array()) - np.asarray(fb_pb.to_array())
    ).max() > 1e-3, "sphere 0 not visible at this t; move the camera"


def test_zero_reflectivity_sees_pure_local_shading():
    """At reflectivity 0 the subtract model shows "that object's color *
    the lighting" and nothing else: raising the bounce limit must not
    change anything (no energy ever continues past the first hit)."""
    scene, cfg = _setup(energy_model="subtract")
    scene = _with_refl(scene, 0.0)
    fb_1, _ = render_frame(scene, cfg.with_(bounce_limit=1))
    fb_10, _ = render_frame(scene, cfg.with_(bounce_limit=10))
    np.testing.assert_array_equal(
        np.asarray(fb_1.to_array()), np.asarray(fb_10.to_array())
    )


def test_subtract_output_is_convex_bounded():
    """Path weights partition unity and every term (clamped shading, u8
    sky texels) lies in [0,1], so the subtract image must too — there is
    no normalization step to re-scale an overshoot."""
    scene, cfg = _setup(energy_model="subtract")
    fb, _ = render_frame(scene, cfg)
    img = np.asarray(fb.to_array(), np.float64)
    assert img.min() >= 0.0
    assert img.max() <= 1.0 + 1e-12


def test_models_actually_differ_on_demo_scene():
    scene, cfg = _setup(energy_model="parity")
    fb_p, _ = render_frame(scene, cfg)
    fb_s, _ = render_frame(scene, cfg.with_(energy_model="subtract"))
    assert np.abs(
        np.asarray(fb_p.to_array()) - np.asarray(fb_s.to_array())
    ).max() > 0.05


# ---------------------------------------------------------------------------
# Production kernels (interpret mode; slow — XLA:CPU compile dominates)
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("procedural", ["colors", None])
def test_demo_kernel_subtract_parity(procedural):
    """The demo Pallas kernel running the subtract model vs the oracle
    running the subtract model, at the standard quantized-exact bar
    (both the in-kernel procedural sky fold and the deferred textured
    epilogue skip the normalization)."""
    from ttrt.kernels.render_pallas import render_frame_pallas

    scene, cfg = _setup(
        dtype=jnp.float32, procedural=procedural, width=32, height=16,
    )
    fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
    fb_pal, rays_pal = render_frame_pallas(scene, cfg, interpret=True)
    assert_quantized_exact_off_knife(
        fb_ref.to_array(), fb_pal.to_array(), scene, cfg, knife_cap=0.25,
        rays_ref=rays_ref, rays_pal=rays_pal,
    )


@pytest.mark.slow
def test_fused_mesh_kernel_subtract_parity():
    """The fused mesh kernel's subtract model vs the XLA oracle on a
    200-sphere cluster-packed scene (same scene family as the fused
    parity gate)."""
    from ttrt.kernels.mesh_fused import render_frame_mesh_fused
    from ttrt.mesh import many_sphere_scene

    cfg = RenderConfig(width=24, height=12, rays_per_pixel=2,
                       bounce_limit=3, dtype=jnp.float32,
                       energy_model="subtract")
    scene = many_sphere_scene(
        skybox_from_faces(make_colors_skybox(16), jnp.float32,
                          procedural="colors"),
        n_spheres=200, width_px=cfg.width, height_px=cfg.height,
        seed=5, floor_cells=3,
    )
    frame = jax.tree.map(lambda a: a.astype(jnp.float32),
                         orbit_camera_frame(0.9, jnp.float32))
    scene = scene.with_camera_frame(frame)
    fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
    fb, rays = render_frame_mesh_fused(scene, cfg, interpret=True,
                                       tile_rows=8)
    assert int(rays) == int(rays_ref)
    assert_quantized_exact_off_knife(
        fb_ref.to_array(), fb.to_array(), scene, cfg, knife_cap=0.30,
    )
