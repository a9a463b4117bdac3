"""On-chip A/B for the quad-packed bilinear epilogue (round 5).

The deferred image-cubemap bilinear epilogue previously issued FOUR
16-wide row gathers (one per tap) and measured ~230 Mray/s
(BENCH_r04 mrays_textured_bilinear) vs ~900 single-tap — i.e. it paid
the measured per-row gather bound 4x. The quad-packed formulation
(render/skybox.bilinear_from_low_tap) builds a (T, 4) table of
pre-clamped tap quads by pure slicing and fetches each ray's whole
filter footprint with ONE 16-wide row gather; row-gather cost is
width-invariant (fetch_packed_texels docstring), so bilinear should
land near the single-tap rate.

This script measures the bench textured tier's two steps (nearest +
bilinear) with bench.py's hardened slope method and prints both rates.

Usage: python scratch/bilinear_quad_ab.py
"""
import sys

sys.path.insert(0, ".")

import jax

import bench
from bench import TimeSeries, _throughput, _mean_rays, _build


def main():
    from ttrt.frames import orbit_camera_frame
    from ttrt.kernels.render_pallas import render_frame_pallas
    from ttrt.scene import Skybox

    cfg, scene = _build(
        dict(width=480, height=280, rays_per_pixel=10, bounce_limit=10)
    )
    scene = scene._replace(
        skybox=Skybox(scene.skybox.packed, procedural=None)
    )
    cfg_bil = cfg.with_(skybox_bilinear=True)

    def make_step(c):
        @jax.jit
        def step(scene, t):
            frame = jax.tree.map(
                lambda a: a.astype(c.dtype), orbit_camera_frame(t, c.dtype)
            )
            fb, rays = render_frame_pallas(scene.with_camera_frame(frame), c)
            return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

        return step

    series = TimeSeries(cfg.dtype, base=900.0)
    for name, c in (("nearest", cfg), ("bilinear-quad", cfg_bil)):
        sec, outs, pers = _throughput(make_step(c), scene, series, repeats=3)
        rays = _mean_rays(outs)
        print(f"{name:>14}: {sec * 1e3:7.3f} ms  "
              f"{rays / sec / 1e6:8.1f} Mray/s  "
              f"(runs {[round(p * 1e3, 3) for p in pers]})", flush=True)


if __name__ == "__main__":
    main()
