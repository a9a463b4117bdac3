"""Shared knife-edge enumeration machinery (the BASELINE.json
"pixel-exact at matched precision" bar, VERDICT r2 #5 / r3 #3).

A production kernel's output must match the XLA oracle bit-for-bit
after the reference's u8 quantization (buffered_draw_screen,
TerminalRayTracer.c:1157-1163) on every pixel EXCEPT those in
explicitly enumerated knife-edge classes:

  K1/K2  perturbation-unstable: the ORACLE's own quantized output
         changes under ulp-scale (3e-6) / catastrophic-cancellation-
         scale (1e-4) pokes at camera origin, camera basis, and light
         positions — these pixels have no stable "correct" value at
         f32 precision.
  KQ     quantization-proximity: float values agree to <5e-5*255 but
         the oracle sits within 0.05/255 of a truncation boundary.

Used by test_pallas_kernel (demo kernel) and test_mesh_fused (fused
mesh kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.render.integrator import render_frame
from ttrt.vec import Vec3


def quantize_u8(img) -> np.ndarray:
    """The reference's output quantization: (int)(c*255) truncation
    (buffered_draw_screen, TerminalRayTracer.c:1157-1163)."""
    return np.clip(
        (np.asarray(img, np.float64) * 255).astype(np.int32), 0, 255
    )


def _rotmat(axis: int, ang: float) -> np.ndarray:
    c, s = np.cos(ang), np.sin(ang)
    if axis == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def perturbed_scenes(scene, eps: float) -> list:
    """Ten ulp-scale pokes at everything a branch predicate can depend
    on: camera origin (+-x,y,z), camera basis rotations about x and y
    (sky texels depend only on DIRECTION, so translations alone cannot
    expose texel-edge pixels), and the point-light position (shadow
    boundaries)."""
    cam = scene.camera
    f = cam.frame
    outs = []
    for axis in range(3):
        for sgn in (1.0, -1.0):
            delta = jnp.zeros(3, f.origin.dtype).at[axis].set(sgn * eps)
            outs.append(scene._replace(camera=cam._replace(
                frame=f._replace(origin=f.origin + delta))))
    for axis in (0, 1):
        for sgn in (1.0, -1.0):
            basis = (
                np.asarray(f.basis, np.float64) @ _rotmat(axis, sgn * eps)
            ).astype(np.asarray(f.basis).dtype)
            outs.append(scene._replace(camera=cam._replace(
                frame=f._replace(basis=jnp.asarray(basis)))))
    pls = scene.point_lights
    for sgn in (1.0, -1.0):
        pos = Vec3(pls.position.x + sgn * eps, pls.position.y + sgn * eps,
                   pls.position.z + sgn * eps)
        outs.append(scene._replace(point_lights=pls._replace(position=pos)))
    return outs


def knife_mask(scene, cfg, q_ref: np.ndarray, eps: float) -> np.ndarray:
    """(H, W) bool: oracle quantized output is unstable under any
    eps-scale perturbation. All perturbed renders run in ONE vmapped
    call. MeshScenes are stripped to the brute-force path (grid=None,
    clusters=None) — acceleration tables hold static-shaped leaves the
    stack/vmap must not touch, and the CPU oracle is brute anyway."""
    if hasattr(scene, "clusters"):
        scene = scene._replace(grid=None, clusters=None)
    stacked = jax.tree.map(
        lambda *leaves: jnp.stack(leaves), *perturbed_scenes(scene, eps)
    )
    fbs, _ = jax.jit(
        jax.vmap(lambda s: render_frame(s, cfg, count_rays=True))
    )(stacked)
    imgs = quantize_u8(np.stack(
        [np.asarray(fbs.x), np.asarray(fbs.y), np.asarray(fbs.z)], axis=-1
    ))  # (P, H, W, 3)
    return (imgs != q_ref[None]).any(axis=(0, 3))


def assert_quantized_exact_off_knife(ref, pal, scene, cfg, knife_cap,
                                     rays_ref=None, rays_pal=None):
    """The full parity bar: zero quantized flips outside K1|K2|KQ, a
    sparse enumeration (measured cap), sub-quantum float agreement off
    the knife set, and matched trace accounting."""
    import pytest

    ref = np.asarray(ref, np.float64)
    pal = np.asarray(pal, np.float64)
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
            (int(y), int(x), int(c), float(ref[y, x, c]),
             float(pal[y, x, c]))
            for y, x, c in zip(ys, xs, cs)
        ][:16]
        pytest.fail(
            f"{uncovered.sum()} quantized flips outside the enumerated "
            f"knife-edge classes [{class_counts}]: (y,x,ch,ref,pal)="
            f"{detail}"
        )

    n_px = flips.shape[0] * flips.shape[1]
    assert knife.mean() <= knife_cap, (
        f"knife enumeration too broad [{class_counts}]"
    )
    assert flips.any(axis=-1).sum() <= 0.03 * n_px
    off = ~knife
    assert float(np.abs(ref - pal)[off].max()) < 0.5 / 255
    assert float(np.median(np.abs(ref - pal))) < 2e-5
    if rays_ref is not None:
        assert abs(int(rays_ref) - int(rays_pal)) <= max(
            0.005 * int(rays_ref), 16
        )
