"""Pallas render kernel vs the fused-XLA oracle: quantized-u8 exactness
with an ENUMERATED knife-edge set (no blanket percentage tolerances).

The kernel (ttrt.kernels.render_pallas) reorders fp math for speed (rsqrt
normalize, sqrt-free hit predicates, shared 1/(2a)), so lanes sitting on a
hit/shadow/texel boundary can legitimately flip vs the oracle. The round-1
contract tolerated a blanket "<=1% of pixels differ"; this version replaces
it with the reference bar (BASELINE.json north_star: pixel-exact at matched
precision, TerminalRayTracer.c:1157-1163 quantization):

  every u8-quantized pixel must MATCH the oracle bit-for-bit UNLESS it is
  in an explicitly enumerated knife-edge class:

  K1  perturbation-unstable at eps=3e-6: the ORACLE's own quantized output
      changes under ulp-scale camera translations/rotations or light
      shifts — silhouettes, checker lines, skybox face diagonals and texel
      edges. These pixels have no stable "correct" value at f32 precision.
  K2  perturbation-unstable at eps=1e-4: catastrophically-cancelled
      predicates (e.g. the reflection-ray origin's c ~ 2*r*EPSILON term in
      the sphere quadratic) where an ulp of difference acts like a much
      larger geometric shift. Still discontinuity-adjacent, just with a
      wider basin.
  KQ  quantization-proximity: the float values agree to <5e-5*255 but the
      oracle sits within 0.05/255 of a u8 truncation boundary.

  The knife classes must stay SPARSE (the enumeration is meaningful) and
  the flip count small; everything outside them is bit-equal.

Tests run on CPU in interpret mode; the compiled Mosaic path is exercised
on real TPU by bench.py and the app. Marked `slow`: the interpret
program's XLA:CPU compile dominates on the 1-vCPU box.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttrt.assets import make_colors_skybox, make_uv_checker_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.render_pallas import render_frame_pallas
from ttrt.render.integrator import render_frame
from ttrt.scene import demo_scene
from ttrt.vec import Vec3

pytestmark = pytest.mark.slow


from knife_util import knife_mask, quantize_u8  # noqa: E402 (shared machinery)


def _small_setup(skybox_maker=make_colors_skybox, t=0.7, procedural=None,
                 bilinear=False):
    cfg = RenderConfig(
        width=32, height=16, rays_per_pixel=2, bounce_limit=10,
        dtype=jnp.float32, skybox_bilinear=bilinear,
    )
    scene = demo_scene(
        skybox_from_faces(skybox_maker(16), jnp.float32,
                          procedural=procedural),
        cfg.width, cfg.height, jnp.float32,
    )
    frame = jax.tree.map(
        lambda a: a.astype(jnp.float32), orbit_camera_frame(t, jnp.float32)
    )
    return scene.with_camera_frame(frame), cfg


@pytest.mark.parametrize("maker,t,procedural,bilinear,knife_cap", [
    (make_colors_skybox, 0.7, None, False, 0.20),
    (make_uv_checker_skybox, 3.3, None, False, 0.20),
    # the bilinear extension on a PROCEDURAL sky: in-kernel 4-tap
    # pattern replay vs the XLA oracle's 4-tap table fetch. The knife
    # set is measurably wider than nearest (21.1% at this frame):
    # lerped checker edges move under ulp perturbations, so more
    # pixels are legitimately perturbation-unstable — the exactness
    # bar (zero uncovered flips) is unchanged.
    (make_uv_checker_skybox, 1.9, "uv_checker", True, 0.27),
    # the bilinear extension on an IMAGE cubemap: deferred 4-tap — the
    # kernel emits the floor-based low-corner index + two weight
    # streams, the XLA epilogue gathers 4 texels and lerps in the
    # oracle's op order (VERDICT r3 #7: serve, don't refuse)
    (make_uv_checker_skybox, 1.9, None, True, 0.30),
])
def test_pallas_quantized_exact_off_knife_edges(maker, t, procedural,
                                                bilinear, knife_cap):
    scene, cfg = _small_setup(maker, t, procedural, bilinear)
    fb_ref, rays_ref = render_frame(scene, cfg, count_rays=True)
    fb_pal, rays_pal = render_frame_pallas(scene, cfg, interpret=True)

    ref = np.asarray(fb_ref.to_array(), np.float64)
    pal = np.asarray(fb_pal.to_array(), np.float64)
    q_ref = quantize_u8(ref)
    q_pal = quantize_u8(pal)

    k1 = knife_mask(scene, cfg, q_ref, 3e-6)
    k2 = knife_mask(scene, cfg, q_ref, 1e-4)
    boundary = np.abs(ref * 255 - np.round(ref * 255))
    kq = (boundary < 0.05) & (np.abs(ref - pal) * 255 < 0.05)

    flips = q_pal != q_ref  # (H, W, 3) channel flips
    knife = k1 | k2
    class_counts = (
        f"K1={int(k1.sum())}px ({k1.mean():.1%}) "
        f"K2={int(k2.sum())}px ({k2.mean():.1%}) "
        f"KQ={int(kq.any(axis=-1).sum())}px union={knife.mean():.1%}"
    )
    uncovered = flips & ~knife[..., None] & ~kq
    if uncovered.any():
        ys, xs, cs = np.nonzero(uncovered)
        detail = [
            (int(y), int(x), int(c), float(ref[y, x, c]), float(pal[y, x, c]))
            for y, x, c in zip(ys, xs, cs)
        ][:16]
        pytest.fail(
            f"{uncovered.sum()} quantized flips outside the enumerated "
            f"knife-edge classes [{class_counts}]: (y,x,ch,ref,pal)={detail}"
        )

    # bit-equality holds on the stable set by construction (asserted above)
    # and the enumeration itself is sparse + flips rare. Cap = measured
    # fraction + margin (scratch/knife_fraction.py, 2026-08-17: colors
    # 12.1%, uv_checker 15.2% — was a soft 40% in round 2):
    n_px = flips.shape[0] * flips.shape[1]
    assert knife.mean() <= knife_cap, (
        f"knife enumeration too broad [{class_counts}]"
    )
    assert flips.any(axis=-1).sum() <= 0.03 * n_px
    # float values off the knife set never deviate by even half a quantum
    # (sub-quantum branch effects deep in a bounce chain are possible; a
    # deviation >= 1/255 would mean a WRONG pixel that merely failed to
    # flip this particular frame)
    off = ~knife
    assert float(np.abs(ref - pal)[off].max()) < 0.5 / 255
    assert float(np.median(np.abs(ref - pal))) < 2e-5
    # trace accounting: same schedule modulo knife-edge branch flips
    assert abs(int(rays_ref) - int(rays_pal)) <= max(
        0.005 * int(rays_ref), 16
    )


def test_pallas_rejects_unsupported():
    scene, cfg = _small_setup()
    with pytest.raises(ValueError):
        render_frame_pallas(scene, cfg.with_(dtype=jnp.float64))
    with pytest.raises(ValueError, match="bilinear"):
        # the ghost split's decoy cancellation is nearest-tap only
        render_frame_pallas(scene, cfg.with_(skybox_bilinear=True),
                            ghost_sky="colors")


@pytest.mark.parametrize("name", ["colors", "uv_checker"])
def test_procedural_sky_matches_textured_exactly(name):
    """The in-kernel procedural cubemap evaluation replays the generator's
    float32 arithmetic exactly (same op order, same (x*255) truncation
    round-trip), so the gather-free path must be BIT-IDENTICAL to the
    deferred-texel-fetch path — zero tolerance, every pixel, and the same
    trace schedule."""
    from ttrt.assets import load_skybox
    from ttrt.scene import Skybox

    cfg = RenderConfig(width=32, height=16, rays_per_pixel=2,
                       bounce_limit=6, dtype=jnp.float32)
    sky_tagged = load_skybox(name)
    assert sky_tagged.procedural == name
    sky_plain = Skybox(sky_tagged.packed, procedural=None)

    frame = jax.tree.map(
        lambda a: a.astype(jnp.float32), orbit_camera_frame(2.1, jnp.float32)
    )

    def render(sky):
        scene = demo_scene(sky, cfg.width, cfg.height, jnp.float32)
        scene = scene.with_camera_frame(frame)
        fb, rays = render_frame_pallas(scene, cfg, interpret=True)
        return np.asarray(fb.to_array()), int(rays)

    img_tex, rays_tex = render(sky_plain)
    img_proc, rays_proc = render(sky_tagged)
    np.testing.assert_array_equal(img_proc, img_tex)
    assert rays_tex == rays_proc


@pytest.mark.parametrize("name,maker", [
    ("colors", make_colors_skybox),
    ("uv_checker", make_uv_checker_skybox),
])
def test_bilinear_procedural_taps_match_table(name, maker):
    """_sky_color_procedural_bilinear = 4 gather-free pattern replays +
    the exact lerp of sample_skybox(bilinear=True). At IDENTICAL
    (face, u, v) the taps must be bit-identical to packed-table fetches
    and the blend bit-identical to the XLA blend — so compare against a
    table-tap oracle built on the kernel's own uv derivation (the uv
    derivations themselves differ in ulp between paths; that class is
    covered by the whole-frame knife-enumeration test)."""
    from ttrt.kernels.render_pallas import (
        _sky_color_procedural_bilinear,
        _sky_face_uv_cont,
    )
    from ttrt.render.skybox import _unpack

    dim = 16
    sky = skybox_from_faces(maker(dim), jnp.float32, procedural=name)
    flat = sky.packed.reshape(-1)

    rng = np.random.default_rng(7)
    d = rng.normal(size=(3, 4096)).astype(np.float32)
    dx, dy, dz = (jnp.asarray(c) for c in d)

    got = _sky_color_procedural_bilinear(dx, dy, dz, dim, name)

    face, u, v = _sky_face_uv_cont(dx, dy, dz)
    fu = (u + 0.5) * dim - 0.5
    fv = (v + 0.5) * dim - 0.5
    u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, dim - 1)
    v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, dim - 1)
    u1 = jnp.minimum(u0 + 1, dim - 1)
    v1 = jnp.minimum(v0 + 1, dim - 1)
    wu = jnp.clip(fu - u0.astype(jnp.float32), 0.0, 1.0)
    wv = jnp.clip(fv - v0.astype(jnp.float32), 0.0, 1.0)
    base = face * (dim * dim)

    def fetch(vi, ui):
        return _unpack(jnp.take(flat, base + vi * dim + ui), jnp.float32)

    c00, c01 = fetch(v0, u0), fetch(v0, u1)
    c10, c11 = fetch(v1, u0), fetch(v1, u1)
    top = c00 * (1.0 - wu) + c01 * wu
    bot = c10 * (1.0 - wu) + c11 * wu
    want = top * (1.0 - wv) + bot * wv
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want.x))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want.y))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want.z))


def test_pallas_specular_matches_xla_extension():
    """The Blinn-Phong specular EXTENSION (reference latent surface,
    TerminalRayTracer.c:913-916/947-950; exposed behind cfg.specular) on
    the Pallas path mirrors ttrt.render.lighting's math. The two paths
    reorder fp ops (rsqrt half-vector normalize, fused accumulation), so
    the bar is the usual quantized agreement with sparse flips, plus a
    sanity check that specular actually changes the image."""
    scene, cfg = _small_setup(make_colors_skybox, 0.7)
    cfg_s = cfg.with_(specular=True)
    fb_ref, _ = render_frame(scene, cfg_s, count_rays=True)
    fb_pal, _ = render_frame_pallas(scene, cfg_s, interpret=True)
    fb_off, _ = render_frame_pallas(scene, cfg, interpret=True)

    ref = np.asarray(fb_ref.to_array(), np.float64)
    pal = np.asarray(fb_pal.to_array(), np.float64)
    off = np.asarray(fb_off.to_array(), np.float64)

    # the extension must DO something (highlights on the shiny spheres)
    assert np.abs(pal - off).max() > 0.05

    flips = (quantize_u8(ref) != quantize_u8(pal)).any(axis=-1)
    n_px = flips.shape[0] * flips.shape[1]
    assert flips.sum() <= 0.03 * n_px, f"{flips.sum()}/{n_px} flips"
    assert float(np.median(np.abs(ref - pal))) < 2e-5
    # pow(n.h, spec=100) amplifies ulp-level half-vector differences
    # ~100x at highlight edges, so isolated pixels may differ visibly;
    # the BULK must agree to quantization scale
    assert float(np.percentile(np.abs(ref - pal), 99)) < 1.0 / 255
