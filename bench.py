"""Benchmark: ray throughput + terminal streaming fps on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mray/s", "vs_baseline": N, ...}

Workload (BASELINE.md): the demo scene at the reference's defaults —
480x280, 10 AA rays/pixel, 10-bounce limit, 2 lights — f32 on device,
rendered by the Pallas kernel (the production path; the fused-XLA oracle
is also timed and reported). "value" is sustained scene-traversals/second
in Mrays/s, counting every primary/bounce trace plus every shadow trace
actually performed (per-bounce alive/shadow counts come from the render
itself, not a formula).

Measurement methodology for the axon tunnel backend (important):
  - a SYNCHRONOUS host fetch costs ~30 ms of pure round-trip latency, so
    per-frame sync timing measures the tunnel, not the chip;
  - instead all frame inputs are STAGED on device first, every frame is
    enqueued asynchronously, and one jax.block_until_ready() at the end
    waits for the whole batch: wall/N = true device time per frame
    (verified: enqueue of N frames returns in ~1 ms, the block scales
    linearly with N);
  - every frame gets a DISTINCT camera time so no result cache can
    short-circuit.

The streaming tier reports three rates: device-only (pipeline rate of
render+encode on chip), synchronous end-to-end (one blocking fetch per
frame — the tunnel-latency lower bound), and pipelined end-to-end (a
small thread pool overlaps the per-frame fetches, the way ttrt.app
streams; this is what a live terminal sees).

vs_baseline compares against the BASELINE.json north-star target of
1 Gray/s/chip (the reference publishes no numbers; its measured CPU rate,
~8 Mray/s, would be a vacuous baseline).
"""

from __future__ import annotations

import concurrent.futures
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
        skybox_from_faces(make_colors_skybox(256), dtype, procedural="colors"),
        cfg.width, cfg.height, dtype,
    )
    return cfg, scene


def _staged_times(cfg, n, base=2.0, step=0.37):
    """Distinct per-frame camera times, staged on device up front so the
    timed loop performs zero host->device transfers."""
    ts = [jnp.asarray(base + step * i, cfg.dtype) for i in range(n)]
    jax.block_until_ready(ts)
    return ts


def _throughput(step_fn, scene, ts, n_small=6):
    """Slope-based device timing, robust against both the tunnel RTT and
    the backend's occasionally-lazy block_until_ready: time (enqueue +
    block + ONE scalar fetch) at two batch sizes and take the slope —
    every constant cost (round trip, dispatch, fetch) cancels."""

    def run(batch):
        outs = [step_fn(scene, t) for t in batch]
        jax.block_until_ready(outs)
        # a real host fetch guarantees execution actually finished
        float(np.asarray(outs[-1][0]))
        return outs

    run(ts[:2])  # warm
    t0 = time.perf_counter()
    run(ts[:n_small])
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = run(ts)
    t_big = time.perf_counter() - t0
    per_frame = (t_big - t_small) / (len(ts) - n_small)
    return max(per_frame, 1e-9), outs


def bench_rays(n_iters: int = 30) -> dict:
    """Mrays/s on the reference-default workload, Pallas + XLA paths."""
    from ttrt.frames import orbit_camera_frame
    from ttrt.kernels.render_pallas import render_frame_pallas
    from ttrt.render.integrator import render_frame

    cfg, scene = _build(
        dict(width=480, height=280, rays_per_pixel=10, bounce_limit=10)
    )

    def make_step(render):
        @jax.jit
        def step(scene, t):
            frame = jax.tree.map(
                lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
            )
            fb, rays = render(scene.with_camera_frame(frame))
            # checksum forces the full framebuffer computation
            return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays
        return step

    step_pallas = make_step(lambda s: render_frame_pallas(s, cfg))
    step_xla = make_step(lambda s: render_frame(s, cfg, count_rays=True))

    ts = _staged_times(cfg, n_iters)

    t0 = time.perf_counter()
    chk, rays0 = step_pallas(scene, ts[0])
    float(chk)
    compile_s = time.perf_counter() - t0

    sec_pal, outs = _throughput(step_pallas, scene, ts)
    rays_per_frame = int(outs[-1][1])
    sec_xla, _ = _throughput(step_xla, scene, ts)

    return {
        "mrays_per_s": rays_per_frame / sec_pal / 1e6,
        "mrays_per_s_xla": rays_per_frame / sec_xla / 1e6,
        "rays_per_frame": rays_per_frame,
        "frame_ms": sec_pal * 1e3,
        "frame_ms_xla": sec_xla * 1e3,
        "compile_s": compile_s,
    }


def bench_streaming(n_iters: int = 60) -> dict:
    """fps on the 240x64 streaming tier (render + on-device ANSI encode):
    device pipeline rate, sync end-to-end, and pipelined end-to-end."""
    from ttrt.frames import orbit_camera_frame
    from ttrt.kernels.render_pallas import render_frame_pallas
    from ttrt.term.encoder import encode_ansi_frame

    cfg, scene = _build(
        dict(width=240, height=64, rays_per_pixel=10, bounce_limit=10)
    )

    @jax.jit
    def frame_step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, _ = render_frame_pallas(scene.with_camera_frame(frame), cfg)
        return encode_ansi_frame(fb)

    ts = _staged_times(cfg, n_iters, base=1.0, step=1.0 / 60.0)
    buf = frame_step(scene, ts[0])
    first = np.asarray(buf)  # compile + first copy

    # device pipeline rate (enqueue all, block once)
    sec_dev, _ = _throughput(frame_step, scene, ts)

    # synchronous end-to-end: one blocking full-frame fetch per frame
    t0 = time.perf_counter()
    for t in ts[: min(20, n_iters)]:
        np.asarray(frame_step(scene, t))
    sec_sync = (time.perf_counter() - t0) / min(20, n_iters)

    # pipelined end-to-end: overlap fetches in a small thread pool (what
    # ttrt.app's streaming loop does); frames still arrive in order
    with concurrent.futures.ThreadPoolExecutor(max_workers=3) as pool:
        futs = []
        t0 = time.perf_counter()
        for t in ts:
            futs.append(pool.submit(np.asarray, frame_step(scene, t)))
        for f in futs:
            f.result()
        sec_pipe = (time.perf_counter() - t0) / n_iters

    return {
        "fps_device": 1.0 / sec_dev,
        "fps_sync": 1.0 / sec_sync,
        "fps_pipelined": 1.0 / sec_pipe,
        "frame_ms_device": sec_dev * 1e3,
        "frame_bytes": int(first.shape[0]),
    }


def bench_textured(n_iters: int = 20) -> dict:
    """Demo workload with a FILE-style (non-procedural) skybox: exercises
    the deferred texel fetch (row-gather + one-hot) instead of the
    in-kernel procedural evaluation."""
    from ttrt.frames import orbit_camera_frame
    from ttrt.kernels.render_pallas import render_frame_pallas
    from ttrt.scene import Skybox

    cfg, scene = _build(
        dict(width=480, height=280, rays_per_pixel=10, bounce_limit=10)
    )
    scene = scene._replace(
        skybox=Skybox(scene.skybox.packed, procedural=None)
    )

    @jax.jit
    def step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, rays = render_frame_pallas(scene.with_camera_frame(frame), cfg)
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    ts = _staged_times(cfg, n_iters)
    sec, outs = _throughput(step, scene, ts)
    return {"mrays_textured": int(outs[-1][1]) / sec / 1e6}


def bench_many_object(n_iters: int = 20) -> dict:
    """Config-4 tier: 10k spheres + triangle-mesh floor through the
    uniform grid (XLA DDA traversal)."""
    from ttrt.assets import make_colors_skybox, skybox_from_faces
    from ttrt.config import RenderConfig
    from ttrt.frames import orbit_camera_frame
    from ttrt.mesh import many_sphere_scene
    from ttrt.render.integrator import render_frame

    cfg = RenderConfig(width=240, height=64, rays_per_pixel=2,
                       bounce_limit=3, dtype=jnp.float32)
    scene = many_sphere_scene(
        skybox_from_faces(make_colors_skybox(64), jnp.float32),
        n_spheres=10_000, width_px=cfg.width, height_px=cfg.height,
    )

    @jax.jit
    def step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, rays = render_frame(
            scene.with_camera_frame(frame), cfg, count_rays=True
        )
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    ts = _staged_times(cfg, n_iters, base=0.5, step=0.21)
    sec, outs = _throughput(step, scene, ts)
    return {
        "mrays_10k_dense": int(outs[-1][1]) / sec / 1e6,
        "grid_dims": list(scene.grid.dims),
    }


def bench_physics(n_iters: int = 200) -> dict:
    """Config-5 tier: GJK contact stepping rate for a 64-body world."""
    from ttrt.physics.demo import build_physics_demo
    from ttrt.physics.world import physics_step
    from ttrt.scene import demo_scene, Spheres
    from ttrt.assets import make_colors_skybox, skybox_from_faces
    from ttrt.vec import Vec3

    key = jax.random.PRNGKey(0)
    n = 64
    centers = jax.random.uniform(key, (n, 3), jnp.float32, -3.0, 3.0)
    radii = jnp.full((n,), 0.25, jnp.float32)
    base = demo_scene(
        skybox_from_faces(make_colors_skybox(8), jnp.float32), 16, 8,
        jnp.float32,
    )
    scene = base._replace(
        spheres=Spheres(
            center=Vec3.from_array(centers), radius=radii,
            material=base.spheres.material.take(
                jnp.zeros(n, jnp.int32)
            ),
        )
    )
    state, params = build_physics_demo(scene, jnp.float32)

    @jax.jit
    def step(s):
        return physics_step(s, params, 1.0 / 60.0, substeps=1)

    s = step(state)
    jax.block_until_ready(jax.tree.leaves(s))

    def chain(k):
        x = state
        for _ in range(k):
            x = step(x)
        jax.block_until_ready(jax.tree.leaves(x))
        float(np.asarray(x.pos.x[0]))
        return x

    chain(3)
    t0 = time.perf_counter()
    chain(20)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain(n_iters)
    t_big = time.perf_counter() - t0
    per = (t_big - t_small) / (n_iters - 20)
    return {"physics_steps_per_s_64body": 1.0 / max(per, 1e-9)}


def bench_pathtrace(n_iters: int = 15) -> dict:
    """Config-5 tier: soft-shadow path tracing throughput."""
    from ttrt.frames import orbit_camera_frame
    from ttrt.render.pathtrace import AreaLights, pathtrace_frame

    cfg, scene = _build(
        dict(width=240, height=64, rays_per_pixel=4, bounce_limit=4)
    )
    lights = AreaLights.create(
        positions=[[0.0, 3.0, 0.0]], radii=[0.5], colors=[[1.0, 1.0, 1.0]],
        intensities=[10.0],
    )

    @jax.jit
    def step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        key = jax.random.fold_in(
            jax.random.PRNGKey(0), (t * 997.0).astype(jnp.int32)
        )
        fb = pathtrace_frame(scene.with_camera_frame(frame), lights, cfg, key)
        return (fb.x.sum() + fb.y.sum() + fb.z.sum(), jnp.uint32(0))

    ts = _staged_times(cfg, n_iters, base=0.3, step=0.41)
    sec, _ = _throughput(step, scene, ts)
    samples = cfg.n_primary_rays
    return {"pathtrace_msamples_per_s": samples / sec / 1e6}


def main() -> int:
    backend = jax.devices()[0]
    r = bench_rays()
    s = bench_streaming()
    extra = {}
    for fn in (bench_textured, bench_many_object, bench_physics,
               bench_pathtrace):
        try:
            extra.update(fn())
        except Exception as e:  # a tier failure must not kill the bench
            extra[f"{fn.__name__}_error"] = str(e)[:120]
    target_mrays = 1000.0  # 1 Gray/s/chip north star (BASELINE.json)
    out = {
        "metric": "demo-scene ray throughput (480x280x10spp, 10-bounce, f32, pallas)",
        "value": round(r["mrays_per_s"], 1),
        "unit": "Mray/s",
        "vs_baseline": round(r["mrays_per_s"] / target_mrays, 3),
        "baseline": "1000 Mray/s/chip north-star (BASELINE.json; reference publishes none)",
        "mrays_xla_path": round(r["mrays_per_s_xla"], 1),
        "rays_per_frame": int(r["rays_per_frame"]),
        "render_frame_ms": round(r["frame_ms"], 3),
        "render_frame_ms_xla": round(r["frame_ms_xla"], 3),
        "compile_s": round(r["compile_s"], 1),
        "fps_240x64_device": round(s["fps_device"], 1),
        "fps_240x64_sync": round(s["fps_sync"], 1),
        "fps_240x64_pipelined": round(s["fps_pipelined"], 1),
        "device": str(backend),
    }
    for k, v in extra.items():
        out[k] = round(v, 1) if isinstance(v, float) else v
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
