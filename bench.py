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
    enqueued asynchronously, and one jax.block_until_ready() + one scalar
    fetch at the end waits for the whole batch; the per-frame time is the
    SLOPE between a small and a large batch, which cancels every constant
    cost (round trip, dispatch, fetch);
  - the backend CACHES results by (executable, input values), so every
    run/phase consumes FRESH camera times — no value is ever timed twice
    (a reused value replays from the cache and inflates throughput);
  - each tier re-times the SAME camera window on every repeat (shifted a
    sub-step epsilon per repeat to stay cache-fresh), so a tier's
    ``*_runs`` spread is pure timing noise — trace counts swing
    3.5-5.7M/frame across camera positions, and rounds 1-4's
    window-per-repeat scheme baked that workload variation into the
    spread (the textured tier's 600-vs-900 'bimodality');
  - tunnel stalls are one-sided (~30-60 ms hiccups): each phase time is
    the MIN over two timings, and a slope 3x faster than its run-pack
    median is discarded as a stall artifact (one inflated 40.5 Gray/s
    run was observed before this defense);
  - run-to-run variance on the shared chip is ~±20%, so every reported
    rate is the MEDIAN of 3-5 independent slope measurements, and the
    headline tiers additionally record ALL N rates (``*_runs`` keys) so
    round-over-round comparisons can separate regressions from drift.

The streaming tier reports four rates: device-only (pipeline rate of
render+encode on chip), synchronous end-to-end (one blocking fetch per
frame — the tunnel-latency lower bound), pipelined end-to-end (threaded
per-frame fetches), and BATCHED end-to-end (8 frames per device program /
per fetch + host-side native ANSI expansion — the production streaming
path of ttrt.app, which amortizes the tunnel RTT over the batch).

vs_baseline compares against the BASELINE.json north-star target of
1 Gray/s/chip (the reference publishes no numbers; its measured CPU rate,
~8 Mray/s, would be a vacuous baseline).
"""

from __future__ import annotations

import concurrent.futures
import itertools
import json
import statistics
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


class TimeSeries:
    """Monotonic source of FRESH staged device scalars: every take(n)
    returns n camera times never used before in this process, staged on
    device up front so timed loops perform zero host->device transfers.

    ``reserve``/``window`` support REPEATABLE windows: a tier reserves one
    block of camera positions once and re-times the SAME window on every
    repeat, each repeat shifted by a sub-step epsilon unique to it. The
    shift keeps every device value fresh (the backend caches results by
    (executable, input values)) while leaving the per-frame workload —
    trace counts swing 3.5-5.7M/frame across camera positions — effectively
    identical across repeats, so a tier's ``*_runs`` spread measures TIMING
    noise, not scene content. (Rounds 1-4 gave every repeat a different
    window; the textured tier's 'bimodal' 600-vs-900 Mray/s runs reproduced
    exactly across days because they were different CAMERAS, not drift.)"""

    def __init__(self, dtype, base=2.0, step=0.37):
        self.dtype = dtype
        self.base = base
        self.step = step
        self.i = 0

    def _stage(self, offsets):
        ts = [jnp.asarray(self.base + self.step * o, self.dtype)
              for o in offsets]
        jax.block_until_ready(ts)
        return ts

    def take(self, n):
        ts = self._stage(range(self.i, self.i + n))
        self.i += n
        return ts

    def reserve(self, n) -> int:
        """Claim n index slots (plus one slot of shift headroom) and
        return the window's start index."""
        start = self.i
        self.i += n + 1
        return start

    def window(self, start, lo, n, shift_id):
        """n staged times at reserved offsets start+lo .. start+lo+n-1,
        perturbed by shift_id * eps. eps is at least 4 f32 ULPs of the
        largest value so distinct shift_ids never round to the same
        device value (a collision would replay the result cache and a
        min-of-reps phase time would keep the fake-fast rep)."""
        hi_val = self.base + self.step * (start + lo + n + 1)
        ulp = float(np.spacing(np.asarray(hi_val, np.float32)))
        eps = max(0.003, 4.0 * ulp / self.step) * shift_id
        # a shift reaching one full step would alias the NEXT window
        # slot (and the phases' disjoint k-ranges); _throughput consumes
        # at most ~32 shift ids per call, far below this bound
        assert eps < 1.0, (eps, shift_id, self.step)
        return self._stage(start + lo + k + eps for k in range(n))


def _run_batch(step_fn, scene, batch):
    outs = [step_fn(scene, t) for t in batch]
    jax.block_until_ready(outs)
    # a real host fetch guarantees execution actually finished (the
    # backend's block_until_ready has been observed lazy for small outputs)
    float(np.asarray(jax.tree.leaves(outs[-1])[0]).reshape(-1)[0])
    return outs


def _throughput(step_fn, scene, series: TimeSeries, n_small=6, n_big=24,
                repeats=3, keep_outs=False, phase_reps=2):
    """Median-of-`repeats` slope timing; every phase uses fresh times.
    Returns (median_sec_per_frame, last_outs, all_sec_per_frame) — the
    full list makes the recorded JSON decision-grade under the chip's
    ±12-20% drift (VERDICT r2: a point estimate can't tell a regression
    from weather).

    ``keep_outs=True`` returns the PER-REPEAT big-batch outputs as the
    second element (a list, one entry per recorded slope) so callers can
    pair each run's rate with ITS OWN trace-count numerator (ADVICE r3).

    Robustness (round 5): tunnel stalls are strictly ADDITIVE noise — a
    single ~30-60 ms hiccup landing in the small phase shrinks the
    (t_big - t_small) delta and INFLATES the rate (BENCH_r05's first run
    recorded a physically impossible 40.5 Gray/s this way). Two layers of
    defense: (1) each phase time is the MIN over ``phase_reps`` timings of
    the same window (fresh shift per rep keeps the result cache cold; min
    is the right estimator under one-sided noise), and (2) a surviving
    slope below 1/3 of the run-pack median is discarded as a stall
    artifact — a chip does not get 3x faster between repeats of the same
    program on the same window."""
    _run_batch(step_fn, scene, series.take(2))  # warm
    start = series.reserve(n_small + n_big)
    next_shift = itertools.count(1).__next__

    def phase(lo, n):
        best_dt, best_outs = None, None
        for _ in range(phase_reps):
            batch = series.window(start, lo, n, next_shift())
            t0 = time.perf_counter()
            outs = _run_batch(step_fn, scene, batch)
            dt = time.perf_counter() - t0
            if best_dt is None or dt < best_dt:
                best_dt, best_outs = dt, outs
        return best_dt, best_outs

    recs = []
    attempts = 0
    while len(recs) < repeats and attempts < repeats + 3:
        attempts += 1
        t_small, _ = phase(0, n_small)
        t_big, outs = phase(n_small, n_big)
        slope = (t_big - t_small) / (n_big - n_small)
        # tunnel jitter occasionally times the SMALL batch longer than
        # the big one; a non-positive slope carries no information —
        # discard and re-measure (bounded retries) instead of recording
        # a clamped sentinel that poisons the *_runs spread
        if slope > 0:
            recs.append((slope, outs))
    if not recs:
        # every attempt timed the small batch slower than the big one:
        # there is no measurement here. Raise into run_tier's isolation
        # (an *_error field) rather than record a fake slope — a 1e-9
        # sentinel would post a ~1e15 Mray/s headline (advisor finding)
        raise RuntimeError(
            f"no positive slope in {attempts} attempts (tunnel jitter "
            "swamped the batch-size delta)"
        )
    med = statistics.median(s for s, _ in recs)
    kept = [rec for rec in recs if rec[0] >= med / 3.0]
    if len(kept) < len(recs):
        from ttrt.utils.logging import log
        log(f"bench: discarded {len(recs) - len(kept)} impossible-fast "
            f"slope(s) (stall artifact): "
            f"{[round(s * 1e3, 3) for s, _ in recs if s < med / 3.0]} ms/frame "
            f"vs pack median {med * 1e3:.3f}")
    pers = [s for s, _ in kept]
    outs_list = [o for _, o in kept]
    return (statistics.median(pers),
            (outs_list if keep_outs else outs_list[-1]), pers)


def _median_rate(run_rays, pers) -> float:
    """Median of the per-run Mray/s rates — self-consistent with the
    *_runs spread (each run's OWN numerator over its OWN slope; a
    mean-rays numerator over a median slope was neither any run's true
    rate nor the median of the list it headlines)."""
    return statistics.median(rr / p / 1e6 for rr, p in zip(run_rays, pers))


def _mean_rays(outs) -> int:
    """Mean per-frame trace count over a measured batch. Trace counts
    swing strongly with camera position (reflective chains die at
    different depths), so normalizing a many-frame time by the LAST
    frame's count made the Mray/s numerator noisy — round 3 measured a
    5.7M vs 3.5M rays/frame spread across camera times at an identical
    2.2 ms frame time. The fetches happen after timing (cached values,
    ~30 ms RTT each)."""
    return int(
        np.mean([int(np.asarray(o[1])) for o in outs])
    )


def bench_rays() -> dict:
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

    series = TimeSeries(cfg.dtype)

    t0 = time.perf_counter()
    chk, rays0 = step_pallas(scene, series.take(1)[0])
    float(chk)
    compile_s = time.perf_counter() - t0

    sec_pal, outs_list, pers = _throughput(step_pallas, scene, series,
                                           repeats=5, keep_outs=True)
    run_rays = [_mean_rays(o) for o in outs_list]
    rays_per_frame = int(np.mean(run_rays))
    sec_xla, _, _ = _throughput(step_xla, scene, series, repeats=3)

    return {
        "mrays_per_s": _median_rate(run_rays, pers),
        "mrays_per_s_runs": [rr / p / 1e6
                             for rr, p in zip(run_rays, pers)],
        "mrays_per_s_xla": rays_per_frame / sec_xla / 1e6,
        "rays_per_frame": rays_per_frame,
        "frame_ms": sec_pal * 1e3,
        "frame_ms_xla": sec_xla * 1e3,
        "compile_s": compile_s,
    }


def bench_streaming(n_iters: int = 60) -> dict:
    """fps on the 240x64 streaming tier (render + ANSI encode): device
    pipeline rate, sync end-to-end, pipelined end-to-end, and the batched
    production path (8 frames/fetch + native host ANSI expansion)."""
    from ttrt import native
    from ttrt.frames import orbit_camera_frame
    from ttrt.kernels.render_pallas import render_frame_pallas
    from ttrt.term.encoder import encode_ansi_frame, encode_ansi_host

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

    series = TimeSeries(cfg.dtype, base=500.0, step=1.0 / 60.0)
    first = np.asarray(frame_step(scene, series.take(1)[0]))

    # device pipeline rate (enqueue all, block once; median-of-3 slope)
    sec_dev, _, _ = _throughput(frame_step, scene, series)

    # synchronous end-to-end: one blocking full-frame fetch per frame
    def sync_run(n):
        ts = series.take(n)
        t0 = time.perf_counter()
        for t in ts:
            np.asarray(frame_step(scene, t))
        return (time.perf_counter() - t0) / n

    sync_run(2)
    sec_sync = statistics.median(sync_run(10) for _ in range(3))

    # pipelined end-to-end: overlap per-frame fetches in a thread pool
    def pipe_run(n):
        ts = series.take(n)
        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
            t0 = time.perf_counter()
            futs = [pool.submit(np.asarray, frame_step(scene, t)) for t in ts]
            for f in futs:
                f.result()
            return (time.perf_counter() - t0) / n

    pipe_run(4)
    sec_pipe = statistics.median(pipe_run(n_iters) for _ in range(3))

    # BATCHED production path (ttrt.app default on accelerator backends):
    # K frames per device program, ONE compact-RGB fetch per batch, native
    # host ANSI expansion counted in the loop.
    from ttrt.app import build_frame_batch_step

    K = 8
    batch_step = build_frame_batch_step(scene, cfg, K)
    zero3 = jnp.zeros(3, cfg.dtype)
    jax.block_until_ready(zero3)
    enc = (
        native.NativeAnsiEncoder(cfg.height, cfg.width).encode
        if native.available else encode_ansi_host
    )

    def batched_run(n_batches):
        ts = series.take(n_batches)
        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
            t0 = time.perf_counter()
            futs = [
                pool.submit(np.asarray, batch_step(t, zero3)) for t in ts
            ]
            for f in futs:
                frames = f.result()
                for rgb in frames:
                    enc(rgb)  # the host-side work a live terminal would do
            return (time.perf_counter() - t0) / (n_batches * K)

    np.asarray(batch_step(series.take(1)[0], zero3))  # compile
    batched_run(2)
    sec_batched = statistics.median(batched_run(12) for _ in range(3))

    return {
        "fps_device": 1.0 / sec_dev,
        "fps_sync": 1.0 / sec_sync,
        "fps_pipelined": 1.0 / sec_pipe,
        "fps_batched": 1.0 / sec_batched,
        "frame_ms_device": sec_dev * 1e3,
        "frame_bytes": int(first.shape[0]),
        "stream_batch": K,
    }


def bench_textured() -> dict:
    """Demo workload with a FILE-style (non-procedural) skybox: exercises
    the real texel fetch instead of the in-kernel procedural evaluation."""
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

    series = TimeSeries(cfg.dtype, base=900.0)
    _sec, outs_list, pers = _throughput(step, scene, series, repeats=5,
                                        keep_outs=True)
    run_rays = [_mean_rays(o) for o in outs_list]

    # BILINEAR image cubemap (the reference's TODO, c:21-33) on the same
    # kernel: the deferred 4-tap epilogue. Round 4 measured the naive
    # four-gather form at ~4x the single tap (230 Mray/s, the number
    # VERDICT r3 #7 asked for); round 5's quad-packed table fetches the
    # whole footprint with one row gather, landing within ~8% of the
    # nearest-tap frame time (repeats=3).
    cfg_bil = cfg.with_(skybox_bilinear=True)

    @jax.jit
    def step_bil(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, rays = render_frame_pallas(
            scene.with_camera_frame(frame), cfg_bil
        )
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    out = {
        "mrays_textured": _median_rate(run_rays, pers),
        "mrays_textured_runs": [rr / p / 1e6
                                for rr, p in zip(run_rays, pers)],
    }
    # the bilinear variant is a first-ever-on-chip program (new wu/wv
    # output streams): its failure must not discard the headline above
    # (per-tier isolation ends at run_tier, so isolate locally)
    try:
        sec_bil, outs_bil, _ = _throughput(step_bil, scene, series,
                                           repeats=3)
        out["mrays_textured_bilinear"] = _mean_rays(outs_bil) / sec_bil / 1e6
    except Exception as e:
        out["mrays_textured_bilinear_error"] = str(e)[:120]
    return out


def bench_many_object() -> dict:
    """Config-4 tier: 10k spheres + triangle-mesh floor.

    Key history (for round-over-round comparison tooling): round 1 emitted
    ``mrays_10k_dense`` (bf16-corrupted numerics — INVALID); round 2 split
    it into ``mrays_10k_cluster`` (production Pallas kernel) +
    ``mrays_10k_dense_corrected`` (precision=HIGHEST XLA dense); round 3
    adds ``mrays_10k_fused`` (monolithic fused kernel, the production
    path)."""
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

    series = TimeSeries(cfg.dtype, base=1300.0, step=0.21)

    # PRODUCTION path: the monolithic fused kernel (one pallas_call per
    # frame — primary rays, every bounce, every shadow ray, shading)
    from ttrt.kernels.mesh_fused import render_frame_mesh_fused

    @jax.jit
    def step_fused(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, rays = render_frame_mesh_fused(
            scene.with_camera_frame(frame), cfg
        )
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    sec_f, outs_f_list, pers_f = _throughput(step_fused, scene, series,
                                             n_small=3, n_big=9, repeats=5,
                                             keep_outs=True)

    # secondary datum: EXTERIOR (fly-over) camera — the same scene viewed
    # from outside the cloud (orbit origin scaled to r ~ 40 over the
    # 30x30 slab). The HEADLINE camera orbits INSIDE the cloud, where the
    # measured live fraction is ~82% and culling geometrically cannot
    # bite (see README); the exterior view shows the near-to-far best-t
    # prune + quarter culls converging on the same kernel.
    @jax.jit
    def step_fly(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        frame = frame._replace(origin=frame.origin * 20.0)
        fb, rays = render_frame_mesh_fused(
            scene.with_camera_frame(frame), cfg
        )
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    # The exterior rate swings >2x with WHERE in the orbit the timed
    # window sits (how much of the cloud is in frame: 13-32 Mray/s
    # observed across windows), so the datum is pinned to three FIXED
    # windows spread across the orbit's 100 s quasi-period (Ry 20 s,
    # Rx 33.3 s) and reports their median — an orbit-fair number, not a
    # series-consumption accident.
    # Mray/s counts PERFORMED traces: culling removes traces from the
    # numerator in the same stroke it removes their time, so no camera
    # can push Mray/s above the narrow-phase body roofline — what
    # culling buys is FRAME TIME, reported alongside (the fused
    # interior/flyover frame_ms pair is the culling-win datum).
    fly_rates, fly_ms = [], []
    for base in (1500.0, 1533.0, 1566.0):
        s_fly = TimeSeries(cfg.dtype, base=base, step=0.21)
        sec_1, outs_1, _ = _throughput(
            step_fly, scene, s_fly, n_small=3, n_big=9, repeats=1
        )
        fly_rates.append(_mean_rays(outs_1) / sec_1 / 1e6)
        fly_ms.append(sec_1 * 1e3)

    # round-2 comparison point: the launch-per-trace cluster kernel
    sec, outs, _ = _throughput(step, scene, series, n_small=3, n_big=9,
                               repeats=1)

    # comparison point: the XLA dense tester at precision=HIGHEST (the
    # only numerically sound non-Pallas path — round-1's 6.6 Mray/s was
    # measured on the bf16-default dense, which returns ~6% false hits
    # at this sphere density)
    scene_dense = scene._replace(clusters=None)

    @jax.jit
    def step_dense(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        fb, rays = render_frame(
            scene.with_camera_frame(frame), cfg, count_rays=True
        )
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    sec_d, outs_d, _ = _throughput(
        step_dense, scene_dense, series, n_small=3, n_big=9, repeats=1
    )
    run_rays_f = [_mean_rays(o) for o in outs_f_list]
    return {
        "mrays_10k_fused": _median_rate(run_rays_f, pers_f),
        "mrays_10k_fused_runs": [rr / p / 1e6
                                 for rr, p in zip(run_rays_f, pers_f)],
        "mrays_10k_flyover": statistics.median(fly_rates),
        "mrays_10k_flyover_windows": fly_rates,
        "frame_ms_10k_fused": sec_f * 1e3,
        "frame_ms_10k_flyover": statistics.median(fly_ms),
        "mrays_10k_cluster": _mean_rays(outs) / sec / 1e6,
        "mrays_10k_dense_corrected": _mean_rays(outs_d) / sec_d / 1e6,
        "grid_dims": list(scene.grid.dims),
    }


def bench_many_object_100k() -> dict:
    """CAPABILITY tier beyond the reference-derived 10k: 100k spheres +
    floor through the SAME fused whole-frame kernel (the Morton pack is
    ~4 MB of the chip's ~128 MB VMEM — an order of magnitude of scale
    headroom over config 4). Exterior fly-over camera (the interior
    datum at this density is all-pairs-roofline-bound by construction;
    see BASELINE.md 10k amendment), spp 2. Its own tier so a failure
    cannot cost the 10k datum."""
    from ttrt.assets import make_colors_skybox, skybox_from_faces
    from ttrt.config import RenderConfig
    from ttrt.frames import orbit_camera_frame
    from ttrt.kernels.mesh_fused import render_frame_mesh_fused
    from ttrt.mesh import many_sphere_scene

    cfg = RenderConfig(width=240, height=64, rays_per_pixel=2,
                       bounce_limit=3, dtype=jnp.float32)
    scene = many_sphere_scene(
        skybox_from_faces(make_colors_skybox(64), jnp.float32),
        n_spheres=100_000, width_px=cfg.width, height_px=cfg.height,
    )

    @jax.jit
    def step_fly(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        frame = frame._replace(origin=frame.origin * 20.0)
        fb, rays = render_frame_mesh_fused(
            scene.with_camera_frame(frame), cfg
        )
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

    # same orbit-pinned 3-window datum as mrays_10k_flyover (the
    # exterior rate swings >2x with orbit phase)
    rates, fly_ms = [], []
    for base in (2100.0, 2133.0, 2166.0):
        s_fly = TimeSeries(cfg.dtype, base=base, step=0.21)
        sec, outs, _ = _throughput(step_fly, scene, s_fly, n_small=3,
                                   n_big=9, repeats=1)
        rates.append(_mean_rays(outs) / sec / 1e6)
        fly_ms.append(sec * 1e3)
    return {
        "mrays_100k_flyover": statistics.median(rates),
        "mrays_100k_flyover_windows": rates,
        "frame_ms_100k_flyover": statistics.median(fly_ms),
        "subclusters_100k": scene.clusters.kb_sph + scene.clusters.kb_tri,
    }


def bench_physics() -> dict:
    """Config-5 tier: GJK stepping rate for a 64-body world, plus the
    FUSED physics-step + render + encode frame rate (the tier's actual
    claim: physics-driven animation on screen)."""
    from ttrt.config import RenderConfig
    from ttrt.physics.demo import (
        build_physics_demo,
        build_physics_frame_step,
    )
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

    def chain(x, k):
        for _ in range(k):
            x = step(x)
        jax.block_until_ready(jax.tree.leaves(x))
        float(np.asarray(x.pos.x[0]))
        return x

    # state evolves every step, so the value cache never replays; the
    # chain slope still cancels the fetch RTT
    x = chain(state, 3)

    def _chain_slope(advance, n_small, n_big, repeats=3):
        """Median-of-repeats chain slope with min-of-2 phase timings
        (same one-sided-stall defense as _throughput; the state chain
        cannot reuse a window, but repeating a phase on fresh evolved
        state times an identical workload). Non-positive slopes are
        discarded, not clamped — the old 1e-9 sentinel could post a
        ~1e9 steps/s rate if two of three repeats hiccupped."""
        def phase(k):
            t0 = time.perf_counter()
            advance(k)
            return time.perf_counter() - t0

        pers, attempts = [], 0
        while len(pers) < repeats and attempts < repeats + 3:
            attempts += 1
            t_small = min(phase(n_small), phase(n_small))
            t_big = min(phase(n_big), phase(n_big))
            slope = (t_big - t_small) / (n_big - n_small)
            if slope > 0:
                pers.append(slope)
        if not pers:
            raise RuntimeError(
                f"no positive chain slope in {attempts} attempts")
        return statistics.median(pers)

    def advance(k):
        nonlocal x
        x = chain(x, k)

    per = _chain_slope(advance, 20, 120)
    out = {"physics_steps_per_s_64body": 1.0 / per}

    # fused physics + render + on-device ANSI encode (streaming shape)
    cfg = RenderConfig(width=240, height=64, rays_per_pixel=4,
                       bounce_limit=4, dtype=jnp.float32)
    pscene = demo_scene(
        skybox_from_faces(
            make_colors_skybox(256), jnp.float32, procedural="colors"
        ),
        cfg.width, cfg.height, jnp.float32,
    )
    pstate, pparams = build_physics_demo(pscene, jnp.float32)
    frame_step = build_physics_frame_step(pscene, cfg, pparams)
    zero3 = jnp.zeros(3, jnp.float32)

    def fchain(st, k):
        buf = None
        for _ in range(k):
            st, buf = frame_step(st, zero3)
        jax.block_until_ready(buf)
        float(np.asarray(buf[0]))
        return st

    st = fchain(pstate, 2)

    def fadvance(k):
        nonlocal st
        st = fchain(st, k)

    per_f = _chain_slope(fadvance, 5, 25)
    out["physics_render_fps"] = 1.0 / per_f
    return out


def bench_pathtrace() -> dict:
    """Config-5 tier: soft-shadow path tracing. PRODUCTION path = the
    Pallas stochastic kernel (counter-based RNG, unrolled bounce chain).

    Two measurements (BASELINE.md target >= 300 Msample/s applies to the
    first):
      - pathtrace_msamples_per_s: THROUGHPUT at a saturating sample
        count (240x64 x 40 spp). The streaming-tier config (4 spp,
        61k samples) is bound by the ~0.5 ms per-program launch floor,
        not the kernel: measured 0.58 ms/frame at 40 spp vs 0.54 at
        4 spp — 10x the samples for ~7% more time.
      - pathtrace_msamples_tier: the 4-spp streaming config end-to-end
        (the launch-bound number the XLA comparison point shares).
    """
    from ttrt.frames import orbit_camera_frame
    from ttrt.kernels.pathtrace_pallas import pathtrace_frame_pallas
    from ttrt.render.pathtrace import AreaLights, pathtrace_frame

    lights = AreaLights.create(
        positions=[[0.0, 3.0, 0.0]], radii=[0.5], colors=[[1.0, 1.0, 1.0]],
        intensities=[10.0],
    )

    def make_steps(cfg):
        @jax.jit
        def step_pallas(scene, t):
            frame = jax.tree.map(
                lambda a: a.astype(cfg.dtype),
                orbit_camera_frame(t, cfg.dtype),
            )
            seed = (t * 997.0).astype(jnp.int32)
            fb = pathtrace_frame_pallas(
                scene.with_camera_frame(frame), lights, cfg, seed
            )
            return (fb.x.sum() + fb.y.sum() + fb.z.sum(), jnp.uint32(0))

        @jax.jit
        def step_xla(scene, t):
            frame = jax.tree.map(
                lambda a: a.astype(cfg.dtype),
                orbit_camera_frame(t, cfg.dtype),
            )
            key = jax.random.fold_in(
                jax.random.PRNGKey(0), (t * 997.0).astype(jnp.int32)
            )
            fb = pathtrace_frame(
                scene.with_camera_frame(frame), lights, cfg, key
            )
            return (fb.x.sum() + fb.y.sum() + fb.z.sum(), jnp.uint32(0))

        return step_pallas, step_xla

    # frames are well under a millisecond: per-batch sync jitter (~10 ms)
    # needs ~100 fresh frames per slope to cancel (round-1 94 vs round-2
    # 33 Msample/s on identical code came from 9-frame slopes)
    series = TimeSeries(jnp.float32, base=1700.0, step=0.41)

    cfg_sat, scene = _build(
        dict(width=240, height=64, rays_per_pixel=40, bounce_limit=4)
    )
    step_sat, _ = make_steps(cfg_sat)
    sec_s, _, pers_s = _throughput(
        step_sat, scene, series, n_small=10, n_big=110, repeats=5
    )

    cfg_t, scene_t = _build(
        dict(width=240, height=64, rays_per_pixel=4, bounce_limit=4)
    )
    step_tier, step_xla = make_steps(cfg_t)
    sec_k, _, _ = _throughput(
        step_tier, scene_t, series, n_small=10, n_big=110
    )
    sec_x, _, _ = _throughput(
        step_xla, scene_t, series, n_small=10, n_big=110
    )
    sat = cfg_sat.n_primary_rays
    tier = cfg_t.n_primary_rays
    return {
        "pathtrace_msamples_per_s": sat / sec_s / 1e6,
        "pathtrace_msamples_runs": [sat / p / 1e6 for p in pers_s],
        "pathtrace_msamples_tier": tier / sec_k / 1e6,
        "pathtrace_msamples_xla": tier / sec_x / 1e6,
    }


_BACKEND_INIT_TIMEOUT_S = 900.0


def _init_backend():
    """jax.devices() with a hard timeout: a dead remote tunnel blocks
    backend init FOREVER (observed this round), and a bench that hangs
    forever records nothing. Returns the device or None; keep-alives go
    to stderr meanwhile (stdout stays reserved for the one JSON line)."""
    import threading

    from ttrt.utils.watchdog import StartupWatchdog

    box = {}

    def init():
        try:
            box["d"] = jax.devices()
        except Exception as e:  # fast failure != timeout; report which
            box["e"] = e

    th = threading.Thread(target=init, daemon=True)
    with StartupWatchdog("backend init (bench)", interval=60.0):
        th.start()
        th.join(_BACKEND_INIT_TIMEOUT_S)
    if "d" in box:
        return box["d"][0], None
    if "e" in box:
        return None, f"backend init failed: {box['e']!r}"
    return None, (
        f"backend init timed out after {_BACKEND_INIT_TIMEOUT_S:.0f}s"
        " (remote tunnel down?)"
    )


def main() -> int:
    from ttrt.utils.logging import log
    from ttrt.utils.compile_cache import enable_compile_cache

    enable_compile_cache(quiet=False)
    backend, init_err = _init_backend()
    if backend is None:
        print(json.dumps({
            "metric": "demo-scene ray throughput (480x280x10spp, 10-bounce, f32, pallas)",
            "value": 0.0,
            "unit": "Mray/s",
            "vs_baseline": 0.0,
            "error": f"{init_err} — no measurement taken",
        }))
        return 1

    def run_tier(fn):
        # a tier failure must not kill the bench; start/end logs make a
        # silently-compiling tier distinguishable from a hang
        t0 = time.perf_counter()
        log(f"bench: {fn.__name__} ...")
        try:
            res = fn()
            log(f"bench: {fn.__name__} done in "
                f"{time.perf_counter() - t0:.0f}s")
            return res
        except Exception as e:
            log(f"bench: {fn.__name__} FAILED after "
                f"{time.perf_counter() - t0:.0f}s: {e!r}")
            return {f"{fn.__name__}_error": str(e)[:120]}

    r = run_tier(bench_rays)
    s = run_tier(bench_streaming)
    extra = {}
    for fn in (bench_textured, bench_many_object,
               bench_many_object_100k, bench_physics,
               bench_pathtrace):
        extra.update(run_tier(fn))
    target_mrays = 1000.0  # 1 Gray/s/chip north star (BASELINE.json)
    out = {
        "metric": "demo-scene ray throughput (480x280x10spp, 10-bounce, f32, pallas)",
        "value": round(r.get("mrays_per_s", 0.0), 1),
        "unit": "Mray/s",
        "vs_baseline": round(r.get("mrays_per_s", 0.0) / target_mrays, 3),
        "baseline": "1000 Mray/s/chip north-star (BASELINE.json; reference publishes none)",
        "mrays_runs": [round(x, 1) for x in r.get("mrays_per_s_runs", [])],
        "mrays_xla_path": round(r.get("mrays_per_s_xla", 0.0), 1),
        "rays_per_frame": int(r.get("rays_per_frame", 0)),
        "render_frame_ms": round(r.get("frame_ms", 0.0), 3),
        "render_frame_ms_xla": round(r.get("frame_ms_xla", 0.0), 3),
        "compile_s": round(r.get("compile_s", 0.0), 1),
        "fps_240x64_device": round(s.get("fps_device", 0.0), 1),
        "fps_240x64_sync": round(s.get("fps_sync", 0.0), 1),
        "fps_240x64_pipelined": round(s.get("fps_pipelined", 0.0), 1),
        "fps_240x64_batched": round(s.get("fps_batched", 0.0), 1),
        "stream_batch": s.get("stream_batch", 0),
        # per-key repeat counts: only the headline tiers run 5 slopes;
        # claiming one global median_of over-trusted the comparison
        # points (ADVICE r3). *_runs keys carry the actual spreads.
        "median_of": {
            "mrays_per_s": 5, "mrays_textured": 5, "mrays_10k_fused": 5,
            "pathtrace_msamples_per_s": 5, "mrays_per_s_xla": 3,
            "mrays_textured_bilinear": 3,
            "mrays_10k_flyover": 3, "mrays_100k_flyover": 3, "fps_240x64_*": 3,
            "mrays_10k_cluster": 1, "mrays_10k_dense_corrected": 1,
        },
        "device": str(backend),
    }
    for d in (r, s):
        for k in d:
            if k.endswith("_error"):
                out[k] = d[k]
    for k, v in extra.items():
        if isinstance(v, list) and v and isinstance(v[0], float):
            out[k] = [round(x, 1) for x in v]
        else:
            out[k] = round(v, 1) if isinstance(v, float) else v
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
