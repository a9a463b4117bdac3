"""Benchmark: ray throughput + terminal streaming fps on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mray/s", "vs_baseline": N, ...}

Workload (BASELINE.md): the demo scene at the reference's defaults —
480x280, 10 AA rays/pixel, 10-bounce limit, 2 lights — f32 on device.
"value" is sustained scene-traversals/second in Mrays/s, counting every
primary/bounce trace plus every shadow trace actually performed (the
per-bounce alive/shadow counts come from the render itself, not a formula).

vs_baseline compares against the BASELINE.json north-star target of
1 Gray/s/chip (the reference publishes no numbers; its measured CPU rate,
~8 Mray/s, would be a vacuous baseline).

Secondary fields: fps on the 240x64 streaming tier (full pipeline: render
+ on-device ANSI encode + device->host copy of the byte buffer), and the
per-stage timings.

Timing notes for the axon backend: results are fetched to host each
iteration (np.asarray of a checksum / the byte buffer) so asynchronous
dispatch can't hide compute; every frame gets a distinct t so no caching
layer can short-circuit.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build(cfg_kwargs, dtype=jnp.float32):
    from ttrt.config import RenderConfig
    from ttrt.assets import make_colors_skybox, skybox_from_faces
    from ttrt.scene import demo_scene

    cfg = RenderConfig(dtype=dtype, **cfg_kwargs)
    scene = demo_scene(
        skybox_from_faces(make_colors_skybox(256), dtype),
        cfg.width, cfg.height, dtype,
    )
    return cfg, scene


def bench_rays(n_iters: int = 30) -> dict:
    """Mrays/s on the reference-default workload."""
    from ttrt.frames import orbit_camera_frame
    from ttrt.render.integrator import render_frame

    cfg, scene = _build(
        dict(width=480, height=280, rays_per_pixel=10, bounce_limit=10)
    )

    @jax.jit
    def step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, rays = render_frame(
            scene.with_camera_frame(frame), cfg, count_rays=True
        )
        # checksum forces the full framebuffer to be computed
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    t0 = time.perf_counter()
    chk, rays0 = step(scene, jnp.asarray(0.123, cfg.dtype))
    float(chk)
    compile_s = time.perf_counter() - t0

    # warmup a couple of steady-state frames
    for i in range(3):
        chk, _ = step(scene, jnp.asarray(1.0 + 0.1 * i, cfg.dtype))
    float(chk)

    # async-pipelined loop: enqueue every frame, sync ONCE at the end, so
    # host<->device round-trip latency (large under the axon tunnel) can't
    # masquerade as compute time. Distinct t per frame defeats caching.
    ray_counts = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        chk, rays = step(scene, jnp.asarray(2.0 + 0.37 * i, cfg.dtype))
        ray_counts.append(rays)
    float(chk)  # sync on the last frame's framebuffer checksum
    dt = time.perf_counter() - t0
    total_rays = int(np.sum([int(r) for r in ray_counts]))
    return {
        "mrays_per_s": total_rays / dt / 1e6,
        "rays_per_frame": total_rays / n_iters,
        "frame_ms": dt / n_iters * 1e3,
        "compile_s": compile_s,
    }


def bench_streaming(n_iters: int = 60) -> dict:
    """fps on the 240x64 streaming tier: full pipeline incl. on-device ANSI
    encode and the device->host byte-buffer copy."""
    from ttrt.frames import orbit_camera_frame
    from ttrt.render.integrator import render_frame
    from ttrt.term.encoder import encode_ansi_frame

    cfg, scene = _build(
        dict(width=240, height=64, rays_per_pixel=10, bounce_limit=10)
    )

    @jax.jit
    def frame_step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, _ = render_frame(scene.with_camera_frame(frame), cfg)
        return encode_ansi_frame(fb)

    buf = frame_step(scene, jnp.asarray(0.1, cfg.dtype))
    _ = np.asarray(buf)  # compile + first copy

    # synchronous per-frame host copy (what a live terminal stream does):
    # this includes tunnel RTT, so it's a lower bound on attached-host fps
    t0 = time.perf_counter()
    for i in range(n_iters):
        buf = frame_step(scene, jnp.asarray(1.0 + i / 60.0, cfg.dtype))
        _ = np.asarray(buf)  # full device->host frame copy every iteration
    dt_sync = time.perf_counter() - t0

    # pipelined variant: enqueue all frames, fetch only the last — measures
    # the chip-side streaming pipeline rate without per-frame RTT
    t0 = time.perf_counter()
    for i in range(n_iters):
        buf = frame_step(scene, jnp.asarray(3.0 + i / 60.0, cfg.dtype))
    _ = np.asarray(buf)
    dt_pipe = time.perf_counter() - t0
    return {
        "fps_240x64": n_iters / dt_sync,
        "frame_ms_240x64": dt_sync / n_iters * 1e3,
        "fps_240x64_pipelined": n_iters / dt_pipe,
        "frame_bytes": int(buf.shape[0]),
    }


def main() -> int:
    backend = jax.devices()[0]
    r = bench_rays()
    s = bench_streaming()
    target_mrays = 1000.0  # 1 Gray/s/chip north star (BASELINE.json)
    out = {
        "metric": "demo-scene ray throughput (480x280x10spp, 10-bounce, f32)",
        "value": round(r["mrays_per_s"], 1),
        "unit": "Mray/s",
        "vs_baseline": round(r["mrays_per_s"] / target_mrays, 3),
        "baseline": "1000 Mray/s/chip north-star (BASELINE.json; reference publishes none)",
        "rays_per_frame": int(r["rays_per_frame"]),
        "render_frame_ms": round(r["frame_ms"], 3),
        "compile_s": round(r["compile_s"], 1),
        "fps_240x64_stream": round(s["fps_240x64"], 1),
        "fps_240x64_pipelined": round(s["fps_240x64_pipelined"], 1),
        "stream_frame_ms": round(s["frame_ms_240x64"], 3),
        "device": str(backend),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
