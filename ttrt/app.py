"""CLI application: the animated demo-scene frame loop, still rendering,
and benchmarking entry points.

Reference driver: main (TerminalRayTracer.c:1235-1370). TPU-native frame
pipeline per tick:

    host clock t -> jitted frame_step(t, cam_offset):
        orbit camera pose (pure function of t, on device)
        render (masked bounce loop)
        quantize + ANSI-encode (on device)
    -> one device->host uint8 copy -> one write(2) -> pace -> fps HUD

Scene/animation state is a pure function of t (plus explicit physics state
in the physics tier), so checkpoint/resume is trivial: persist t.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.config import ConfigError, RenderConfig
from ttrt import assets
from ttrt.frames import orbit_camera_frame
from ttrt.render.integrator import render_frame
from ttrt.scene import Scene, demo_scene
from ttrt.scenefile import SceneFileError
from ttrt.term.display import KeyboardInput, SigintFlag, TerminalDisplay
from ttrt.term.encoder import encode_ansi_frame
from ttrt.utils.logging import log
from ttrt.utils.watchdog import StartupWatchdog, first_output

CAMERA_MOVE_SPEED = 0.1  # meters per keypress (reference stub's constant)


def default_area_lights(cfg: RenderConfig):
    """The demo's point light recast as a spherical emitter for the
    path-tracing tier (soft shadows)."""
    from ttrt.render.pathtrace import AreaLights

    return AreaLights.create(
        positions=[[0.0, 3.0, 0.0]],
        radii=[0.5],
        colors=[[1.0, 1.0, 1.0]],
        intensities=[10.0],
        dtype=cfg.dtype,
    )


def build_pathtrace_frame_step(scene: Scene, cfg: RenderConfig,
                               encode: str = "device", seed: int = 0,
                               mesh=None):
    """jit: (t, cam_offset) -> frame bytes via the Monte-Carlo integrator;
    each frame draws an independent RNG stream from the frame index.

    Routes to the counter-RNG Pallas kernel (pathtrace_frame_pallas,
    measured ~10x the XLA estimator at saturating sample counts) when it
    serves the config — TPU backend, f32, procedural sky, demo-tier
    geometry, bounce_limit <= 10, <= 10 area lights — else the XLA
    estimator (the only path for f64 / image cubemaps / MeshScene)."""
    from ttrt.render.pathtrace import pathtrace_frame
    from ttrt.term.encoder import encode_ansi_frame, encode_rgb_frame

    enc = encode_ansi_frame if encode == "device" else encode_rgb_frame
    lights = default_area_lights(cfg)

    use_kernel = (
        cfg.dtype == jnp.float32
        and scene.skybox.procedural is not None
        and cfg.bounce_limit <= 10
        and lights.count <= 10
        and type(scene) is Scene
        and jax.default_backend() != "cpu"
    )
    if mesh is not None:
        # multi-chip path tracing: every device renders the full image at
        # spp/n_devices with independently hashed/folded streams; one
        # psum combines the radiance sums (ttrt.parallel.sharding). The
        # per-device estimator keeps the single-chip kernel routing: the
        # counter-RNG Pallas sampler when eligible, else XLA.
        from ttrt.parallel.sharding import (
            check_pathtrace_mesh,
            pathtrace_frame_sharded,
            pathtrace_frame_sharded_pallas,
        )

        check_pathtrace_mesh(cfg, mesh)
        if use_kernel:
            from ttrt.kernels.pathtrace_pallas import _mix32

            @jax.jit
            def frame_step(t, cam_offset):
                frame = orbit_camera_frame(t, cfg.dtype)
                frame = frame._replace(origin=frame.origin + cam_offset)
                s = scene.with_camera_frame(frame)
                tq = (t * 1000.0).astype(jnp.int32).astype(jnp.uint32)
                fseed = (
                    _mix32(jnp.uint32(seed) * jnp.uint32(0x9E3779B9)) ^ tq
                ).astype(jnp.int32)
                fb = pathtrace_frame_sharded_pallas(
                    s, lights, cfg, fseed, mesh
                )
                return enc(fb)

            return frame_step

        base_key = jax.random.PRNGKey(seed)

        @jax.jit
        def frame_step(t, cam_offset):
            frame = orbit_camera_frame(t, cfg.dtype)
            frame = frame._replace(origin=frame.origin + cam_offset)
            s = scene.with_camera_frame(frame)
            key = jax.random.fold_in(
                base_key, (t * 1000.0).astype(jnp.int32)
            )
            fb = pathtrace_frame_sharded(s, lights, cfg, key, mesh)
            return enc(fb)

        return frame_step

    if use_kernel:
        from ttrt.kernels.pathtrace_pallas import pathtrace_frame_pallas

        @jax.jit
        def frame_step(t, cam_offset):
            frame = orbit_camera_frame(t, cfg.dtype)
            frame = frame._replace(origin=frame.origin + cam_offset)
            s = scene.with_camera_frame(frame)
            # per-frame stream: MIX the user seed and the quantized
            # scene time instead of adding them — seed1+t1 == seed2+t2
            # would replay an identical frame stream across different
            # --seed runs (the XLA path's fold_in has no such collisions;
            # the kernel hashes whatever lands in fseed, so distinct
            # fseeds decorrelate — test_consecutive_seeds_decorrelated)
            from ttrt.kernels.pathtrace_pallas import _mix32

            tq = (t * 1000.0).astype(jnp.int32).astype(jnp.uint32)
            fseed = (
                _mix32(jnp.uint32(seed) * jnp.uint32(0x9E3779B9)) ^ tq
            ).astype(jnp.int32)
            fb = pathtrace_frame_pallas(s, lights, cfg, fseed)
            return enc(fb)

        return frame_step

    base_key = jax.random.PRNGKey(seed)

    @jax.jit
    def frame_step(t, cam_offset):
        frame = orbit_camera_frame(t, cfg.dtype)
        frame = frame._replace(origin=frame.origin + cam_offset)
        s = scene.with_camera_frame(frame)
        # derive the per-frame key from the (quantized) scene time
        key = jax.random.fold_in(
            base_key, (t * 1000.0).astype(jnp.int32)
        )
        fb = pathtrace_frame(s, lights, cfg, key)
        return enc(fb)

    return frame_step


def _kernel_gates(scene, cfg: RenderConfig) -> bool:
    """Pallas-kernel eligibility shared by the single-chip and sharded
    pickers (they MUST agree — a gate added to only one silently routes
    sharded and unsharded renders to different paths, the round-3
    self-review bug class): f32, bounce_limit <= 16, a real accelerator
    backend, and a sky the kernels can carry — procedural, or an image
    cubemap small enough for the counter-stream texel-index bound
    (6*dim^2 <= (2^31-1)>>10, i.e. dim <= 591)."""
    base_ok = (
        cfg.dtype == jnp.float32
        and cfg.bounce_limit <= 16
        and jax.default_backend() != "cpu"
    )
    sky_dim_ok = (
        scene.skybox.procedural is not None
        or 6 * scene.skybox.dim * scene.skybox.dim <= (2**31 - 1) >> 10
    )
    return base_ok and sky_dim_ok


def _pick_renderer(scene, cfg: RenderConfig, renderer: str = "auto"):
    """Select the render path: the demo-tier Pallas kernel or the fused
    mesh Pallas kernel when they support the config (f32, in-kernel
    shading incl. the specular extension, bilinear for both sky kinds —
    procedural in-kernel, image cubemaps via the deferred 4-tap
    epilogue — real TPU backend), else the fused-XLA integrator (the
    oracle, and the only path for the f64 extension)."""
    from ttrt.mesh.scene import MeshScene

    if renderer == "xla":
        return render_frame
    if _kernel_gates(scene, cfg) and type(scene) is Scene:
        # the demo kernel serves specular in-kernel and bilinear for
        # both sky kinds (procedural in-kernel, image cubemaps via the
        # deferred 4-tap epilogue)
        from ttrt.kernels.render_pallas import render_frame_pallas

        return render_frame_pallas
    if _kernel_gates(scene, cfg) and (
        isinstance(scene, MeshScene) and scene.clusters is not None
    ):
        # many-object tier: the monolithic fused kernel (one pallas_call
        # per frame) — without it the XLA integrator relaunches the
        # cluster nearest-hit kernel per bounce AND per shadow ray
        # (~30 launches/frame, measured 3-4x slower end-to-end)
        from ttrt.kernels.mesh_fused import render_frame_mesh_fused

        return render_frame_mesh_fused
    if renderer == "pallas":
        raise ConfigError("pallas renderer unavailable for this config")
    return render_frame


def _pick_renderer_sharded(scene, cfg: RenderConfig, mesh, renderer="auto"):
    """Multi-chip analog of _pick_renderer: returns a (scene, cfg) ->
    (fb, rays) closure over the ('rows', 'samples') mesh. Same routing
    rules — the band-capable Pallas kernels when they serve the config
    (each chip launches one kernel on its row band x sample slice), else
    the shard_map'd XLA integrator (which also serves MeshScene and f64
    on CPU meshes)."""
    import functools

    from ttrt.mesh.scene import MeshScene
    from ttrt.parallel.sharding import (
        check_mesh_divisible,
        render_frame_sharded,
        render_frame_sharded_mesh_fused,
        render_frame_sharded_pallas,
    )

    check_mesh_divisible(cfg, mesh)
    if "objects" in mesh.axis_names:
        # geometry parallelism (--mesh RxSxO): each chip sweeps its
        # Morton subcluster slice; pmin argmin-by-t combines winners
        # per trace (ttrt.parallel.objects). Needs a cluster pack.
        from ttrt.parallel.objects import render_frame_sharded_objects

        if not (isinstance(scene, MeshScene)
                and scene.clusters is not None):
            raise ConfigError(
                "--mesh with an objects factor needs a cluster-packed "
                "many-object scene (--scene many)"
            )
        return functools.partial(render_frame_sharded_objects, mesh=mesh)
    if renderer == "xla":
        return functools.partial(render_frame_sharded, mesh=mesh)
    if _kernel_gates(scene, cfg) and type(scene) is Scene:
        return functools.partial(render_frame_sharded_pallas, mesh=mesh)
    if _kernel_gates(scene, cfg) and (
        isinstance(scene, MeshScene) and scene.clusters is not None
    ):
        return functools.partial(
            render_frame_sharded_mesh_fused, mesh=mesh
        )
    if renderer == "pallas":
        raise ConfigError("pallas renderer unavailable for this config")
    return functools.partial(render_frame_sharded, mesh=mesh)


def build_frame_step(scene: Scene, cfg: RenderConfig, encode: str = "device",
                     renderer: str = "auto", mesh=None):
    """jit-compile t -> frame bytes. ``cam_offset`` is a world-frame camera
    translation driven by arrow keys (extension; reference stub at
    TerminalRayTracer.c:1196-1215).

    ``encode``: 'device' emits the full ANSI escape buffer from the TPU
    (one big uint8 copy); 'host' emits the compact (H, W, 3) uint8 frame —
    ~8.6x less host<->device traffic — and the host expands it with the
    native C template-patching encoder (csrc/ttrt_native.c).

    ``mesh``: a ('rows', 'samples') jax.sharding.Mesh routes the frame
    through the multi-chip renderers (--mesh); the ANSI encode stays
    row-local per chip and the bytes gather on the host fetch."""
    from ttrt.term.encoder import encode_rgb_frame

    enc = encode_ansi_frame if encode == "device" else encode_rgb_frame
    if mesh is not None:
        render = _pick_renderer_sharded(scene, cfg, mesh, renderer)
    else:
        render = _pick_renderer(scene, cfg, renderer)

    @jax.jit
    def frame_step(t, cam_offset):
        frame = orbit_camera_frame(t, cfg.dtype)
        frame = frame._replace(origin=frame.origin + cam_offset)
        s = scene.with_camera_frame(frame)
        fb, _ = render(s, cfg)
        return enc(fb)

    return frame_step


def build_frame_batch_step(scene: Scene, cfg: RenderConfig, batch: int,
                           renderer: str = "auto"):
    """jit: (t0, cam_offset) -> (batch, H, W, 3) uint8 — ``batch``
    consecutive animation frames (t0, t0+1/fps, ...) rendered in ONE
    device program and fetched in ONE device->host copy.

    On a remote-attached TPU the per-fetch round trip (~30 ms on the axon
    tunnel) — not the chip (thousands of device-fps at the streaming
    tier) — is the end-to-end bottleneck; batching amortizes one RTT over
    ``batch`` frames. The host expands each compact RGB frame to ANSI with
    the native encoder (csrc/ttrt_native.c) and paces emission to the
    60 fps contract (TerminalRayTracer.c:50,1350-1364). lax.map keeps
    compile cost and program size at one frame's worth."""
    from ttrt.term.encoder import encode_rgb_frame

    render = _pick_renderer(scene, cfg, renderer)

    @jax.jit
    def batch_step(t0, cam_offset):
        ts = t0 + jnp.arange(batch, dtype=cfg.dtype) * jnp.asarray(
            cfg.frame_duration, cfg.dtype
        )

        def one(t):
            frame = orbit_camera_frame(t, cfg.dtype)
            frame = frame._replace(origin=frame.origin + cam_offset)
            s = scene.with_camera_frame(frame)
            fb, _ = render(s, cfg)
            return encode_rgb_frame(fb)

        return jax.lax.map(one, ts)

    return batch_step


WARM_BOUNCE_LIMIT = 4

# threads running a background remote compile; consulted at exit
_bg_compile_threads: list = []


def _exit_for_teardown(rc: int) -> int:
    """Exit guard for in-flight background remote compiles.

    A WarmStartStep deep compile that is still inside the backend's C++
    compile RPC at interpreter teardown can be neither joined (minutes)
    nor cancelled; CPython killing the daemon thread mid-RPC makes glibc
    terminate (observed on the axon backend: ``FATAL: exception not
    rethrown``, abort rc=134 — AFTER a fully valid stream and terminal
    restore). Once every Python-side cleanup has run, skip native
    teardown with os._exit instead of letting the abort overwrite an
    honest exit code."""
    if any(t.is_alive() for t in _bg_compile_threads):
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)
    return rc


class WarmStartStep:
    """Cold-start mitigation. The reference paints its first frame
    instantly (TerminalRayTracer.c:1235-1370); the depth-10 unrolled
    Pallas program first-compiles in minutes on a cold compile cache.
    This wrapper streams with a SHALLOW (bounce_limit=4) variant of the
    same program immediately — the unrolled body is ~2.5x smaller, so
    the compile lands in tens of seconds — while a daemon thread
    compiles the full-depth program and swaps it in when ready. Until
    the swap, reflection chains truncate at 4 bounces (visually:
    slightly dimmer mirror-in-mirror detail for a few seconds; the
    demo scene's contribution products fall below CONTRIBUTION_EPS
    within ~4-6 bounces almost everywhere).

    Measured on the axon tunnel (2026-08-17, streaming tier 240x64x10spp
    bounce-10): first frame at ~211 s with warm-start vs ~804 s without
    (3.8x) — the remote compile service did NOT serve a cross-process
    cache hit for either structure that session, so the shallow compile
    always pays off. The residual ~200 s floor is the backend, not the
    program: ~90 s first device->host fetch per process plus the small
    program's remote compile; a local TPU runtime would paint in
    seconds."""

    def __init__(self, scene: Scene, cfg: RenderConfig, batch: int,
                 renderer: str):
        import threading

        self.step = None
        self.warming = cfg.bounce_limit > WARM_BOUNCE_LIMIT
        if self.warming:
            shallow = cfg.with_(bounce_limit=WARM_BOUNCE_LIMIT)
            self.step = build_frame_batch_step(scene, shallow, batch,
                                               renderer)
            t = threading.Thread(
                target=self._compile_deep,
                args=(scene, cfg, batch, renderer),
                daemon=True,
            )
            _bg_compile_threads.append(t)  # see _exit_for_teardown
            t.start()
        else:
            self.step = build_frame_batch_step(scene, cfg, batch, renderer)

    def _compile_deep(self, scene, cfg, batch, renderer):
        try:
            deep = build_frame_batch_step(scene, cfg, batch, renderer)
            out = deep(
                jnp.zeros((), cfg.dtype), jnp.zeros(3, cfg.dtype)
            )
            jax.block_until_ready(out)
            self.step = deep  # atomic rebind; issuers pick it up next batch
            self.warming = False
            log("warm-start: full-depth kernel compiled, swapped in")
        except Exception as e:  # keep streaming shallow rather than die
            self.warming = False
            log(f"warm-start: full-depth compile failed ({e!r}); "
                f"continuing at bounce_limit={WARM_BOUNCE_LIMIT}")

    def __call__(self, t0, cam_offset):
        return self.step(t0, cam_offset)


def _run_animation_batched(cfg: RenderConfig, scene: Scene, batch: int,
                           max_frames: int | None, interactive: bool,
                           renderer: str, stats: bool,
                           pipeline: int, warm_start: bool = True) -> float:
    """Batched streaming loop: ``batch`` frames per device program + ONE
    compact-RGB fetch, several fetches in flight, host-side native ANSI
    expansion, per-frame 60 fps pacing. Keyboard camera input applies at
    batch granularity (one batch of lag). Frame times follow the frame
    INDEX (t = n/fps), not the wall clock — the pacing loop keeps the two
    in step, and a fetch stall skips no scene time."""
    import collections
    import concurrent.futures

    from ttrt import native
    from ttrt.term.encoder import encode_ansi_host
    from ttrt.utils.profiling import FrameMeter, StageTimers

    batch_step = (
        WarmStartStep(scene, cfg, batch, renderer) if warm_start
        else build_frame_batch_step(scene, cfg, batch, renderer)
    )
    host_enc = (
        native.NativeAnsiEncoder(cfg.height, cfg.width)
        if native.available else None
    )
    depth = max(2, pipeline or 3)
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=depth)
    pending: "collections.deque" = collections.deque()
    cam_offset = np.zeros(3, np.float64)
    meter = FrameMeter()
    timers = StageTimers()
    fps = 0.0
    n = 0
    issued = 0
    deadline = None
    try:
        with SigintFlag() as sig, TerminalDisplay() as disp, \
                KeyboardInput() as keys:
            while not sig.received and (
                max_frames is None or n < max_frames
            ):
                while len(pending) < depth and (
                    max_frames is None or issued < max_frames + batch
                ):
                    t0 = issued * cfg.frame_duration
                    dev = batch_step(
                        jnp.asarray(t0, cfg.dtype),
                        jnp.asarray(cam_offset, cfg.dtype),
                    )
                    pending.append(pool.submit(np.asarray, dev))
                    issued += batch
                with timers.stage("render+copy"):
                    frames = pending.popleft().result()
                for rgb in frames:
                    if sig.received or (
                        max_frames is not None and n >= max_frames
                    ):
                        break
                    t_f0 = time.monotonic()
                    if interactive:
                        key = keys.poll()
                        if key == "quit":
                            sig.received = True
                            break
                        elif key == "up":
                            cam_offset[1] += CAMERA_MOVE_SPEED
                        elif key == "down":
                            cam_offset[1] -= CAMERA_MOVE_SPEED
                        elif key == "left":
                            cam_offset[0] -= CAMERA_MOVE_SPEED
                        elif key == "right":
                            cam_offset[0] += CAMERA_MOVE_SPEED
                    with timers.stage("encode+write"):
                        disp.write_frame(
                            host_enc.encode(rgb) if host_enc is not None
                            else encode_ansi_host(rgb)
                        )
                    first_output()
                    budget = cfg.frame_duration
                    now = time.monotonic()
                    deadline = (
                        now if deadline is None else deadline
                    ) + budget
                    if deadline < now:
                        deadline = now
                    with timers.stage("pace"):
                        native.sleep_until(deadline)
                    n += 1
                    dt_frame = max(time.monotonic() - t_f0, 1e-9)
                    fps = 1.0 / dt_frame
                    meter.update(dt_frame)
                    disp.write_fps(fps)
    finally:
        pool.shutdown(wait=False)
    if stats:
        timers.log_summary()
        log(f"ema: {meter.hud()}  frames: {n}  batch: {batch}")
    return fps


def run_animation(cfg: RenderConfig, skybox_name: str = "colors",
                  max_frames: int | None = None,
                  interactive: bool = True,
                  encode: str = "auto",
                  scene: Scene | None = None,
                  profile_dir: str | None = None,
                  stats: bool = False,
                  pipeline: int = 0,
                  pathtrace: bool = False,
                  seed: int = 0,
                  renderer: str = "auto",
                  batch: int = 0,
                  warm_start: bool = True,
                  mesh_spec: str | None = None) -> float:
    """The reference's infinite frame loop (TerminalRayTracer.c:1315-1366):
    render, draw, pace to the frame budget, print fps. Returns the last
    measured fps.

    ``pipeline`` > 0 keeps that many frames in flight and overlaps the
    device->host copies in a small thread pool — essential when the host
    link has high latency (remote-attached TPU): render of frame t+k
    proceeds while frame t's bytes are still in transit. Camera input
    takes effect ``pipeline`` frames later."""
    import collections
    import concurrent.futures

    from ttrt import native
    from ttrt.term.encoder import encode_ansi_host
    from ttrt.utils.profiling import FrameMeter, StageTimers, profile_trace

    if encode == "auto":
        encode = "host" if native.available else "device"
    if scene is None:
        skybox = assets.load_skybox(skybox_name, cfg.dtype)
        scene = demo_scene(skybox, cfg.width, cfg.height, cfg.dtype)
    mesh = None
    if mesh_spec:
        from ttrt.parallel.sharding import mesh_from_spec

        mesh = mesh_from_spec(mesh_spec)
        if batch > 1:
            log("--mesh: forcing --batch 1 (the batched fetch loop is "
                "single-device-program; pipelining still applies)")
        batch = 1  # the sharded step is one program over the whole mesh
    if batch == 0:
        # auto: batch fetches when frames cross a high-latency device link
        # (remote-attached TPU); on CPU the copy is free and batching only
        # adds input lag
        batch = 8 if (
            not pathtrace and jax.default_backend() != "cpu"
        ) else 1
    if batch > 1 and not pathtrace:
        return _run_animation_batched(
            cfg, scene, batch, max_frames, interactive, renderer, stats,
            pipeline, warm_start,
        )
    if pathtrace:
        frame_step = build_pathtrace_frame_step(scene, cfg, encode, seed,
                                                mesh=mesh)
    else:
        frame_step = build_frame_step(scene, cfg, encode, renderer,
                                      mesh=mesh)
    host_enc = None
    if encode == "host" and native.available:
        host_enc = native.NativeAnsiEncoder(cfg.height, cfg.width)

    cam_offset = np.zeros(3, np.float64)
    meter = FrameMeter()
    timers = StageTimers()
    fps = 0.0
    n = 0
    start = time.monotonic()
    deadline = None
    pool = (
        concurrent.futures.ThreadPoolExecutor(max_workers=max(2, pipeline))
        if pipeline > 0 else None
    )
    pending: "collections.deque" = collections.deque()

    def emit(buf):
        nonlocal deadline, fps, n
        with timers.stage("encode+write"):
            if encode == "host":
                if host_enc is not None:
                    disp.write_frame(host_enc.encode(buf))
                else:
                    disp.write_frame(encode_ansi_host(buf))
            else:
                disp.write_frame(buf)
        first_output()
        # drift-free pacing: absolute deadlines advance by the budget
        # (reference: relative nanosleep, TerminalRayTracer.c:1350-1355)
        budget = cfg.frame_duration
        now = time.monotonic()
        deadline = (now if deadline is None else deadline) + budget
        if deadline < now:  # fell behind: resync, don't death-spiral
            deadline = now
        with timers.stage("pace"):
            native.sleep_until(deadline)
        n += 1

    try:
        with SigintFlag() as sig, TerminalDisplay() as disp, \
                KeyboardInput() as keys, profile_trace(profile_dir):
            issued = 0
            while not sig.received and (
                max_frames is None or issued < max_frames
            ):
                t0 = time.monotonic()
                t = t0 - start
                if interactive:
                    key = keys.poll()
                    if key == "quit":
                        break
                    elif key == "up":
                        cam_offset[1] += CAMERA_MOVE_SPEED
                    elif key == "down":
                        cam_offset[1] -= CAMERA_MOVE_SPEED
                    elif key == "left":
                        cam_offset[0] -= CAMERA_MOVE_SPEED
                    elif key == "right":
                        cam_offset[0] += CAMERA_MOVE_SPEED
                dev_buf = frame_step(
                    jnp.asarray(t, cfg.dtype),
                    jnp.asarray(cam_offset, cfg.dtype),
                )
                issued += 1
                if pool is not None:
                    pending.append(pool.submit(np.asarray, dev_buf))
                    if len(pending) <= pipeline:
                        continue  # fill the pipeline before first emit
                    with timers.stage("render+copy"):
                        buf = pending.popleft().result()
                else:
                    with timers.stage("render+copy"):
                        buf = np.asarray(dev_buf)
                emit(buf)
                dt_frame = max(time.monotonic() - t0, 1e-9)
                fps = 1.0 / dt_frame
                meter.update(dt_frame)
                disp.write_fps(fps)
            # drain in-flight frames
            while pending:
                emit(pending.popleft().result())
    finally:
        if pool is not None:
            pool.shutdown(wait=False)
    if stats:
        timers.log_summary()
        log(f"ema: {meter.hud()}  frames: {n}")
    return fps


def run_physics(cfg: RenderConfig, skybox_name: str = "colors",
                max_frames: int | None = None, interactive: bool = True,
                encode: str = "auto",
                checkpoint: str | None = None) -> float:
    """Physics tier: GJK-stepped bouncing spheres fused with the render
    loop; optional checkpoint/resume of the state pytree."""
    from ttrt import native
    from ttrt.physics.demo import (
        build_physics_demo,
        build_physics_frame_step,
        load_checkpoint,
        save_checkpoint,
    )
    from ttrt.term.encoder import encode_ansi_host

    if encode == "auto":
        encode = "host" if native.available else "device"
    skybox = assets.load_skybox(skybox_name, cfg.dtype)
    scene = demo_scene(skybox, cfg.width, cfg.height, cfg.dtype)
    state, params = build_physics_demo(scene, cfg.dtype)
    if checkpoint:
        resumed = load_checkpoint(checkpoint, state)
        if resumed is not None:
            state = resumed
            log(f"resumed physics state at t={float(state.t):.2f}s")
    frame_step = build_physics_frame_step(scene, cfg, params, encode)
    host_enc = (
        native.NativeAnsiEncoder(cfg.height, cfg.width)
        if encode == "host" and native.available
        else None
    )

    cam_offset = np.zeros(3, np.float64)
    fps = 0.0
    n = 0
    deadline = None
    try:
        with SigintFlag() as sig, TerminalDisplay() as disp, \
                KeyboardInput() as keys:
            while not sig.received and (max_frames is None or n < max_frames):
                t0 = time.monotonic()
                if interactive:
                    key = keys.poll()
                    if key == "quit":
                        break
                    elif key == "up":
                        cam_offset[1] += CAMERA_MOVE_SPEED
                    elif key == "down":
                        cam_offset[1] -= CAMERA_MOVE_SPEED
                    elif key == "left":
                        cam_offset[0] -= CAMERA_MOVE_SPEED
                    elif key == "right":
                        cam_offset[0] += CAMERA_MOVE_SPEED
                state, buf = frame_step(
                    state, jnp.asarray(cam_offset, cfg.dtype)
                )
                buf = np.asarray(buf)
                if encode == "host":
                    if host_enc is not None:
                        disp.write_frame(host_enc.encode(buf))
                    else:
                        disp.write_frame(encode_ansi_host(buf))
                else:
                    disp.write_frame(buf)
                first_output()
                budget = cfg.frame_duration
                now = time.monotonic()
                deadline = (now if deadline is None else deadline) + budget
                if deadline < now:
                    deadline = now
                native.sleep_until(deadline)
                fps = 1.0 / max(time.monotonic() - t0, 1e-9)
                disp.write_fps(fps)
                n += 1
    finally:
        if checkpoint:
            save_checkpoint(checkpoint, state)
            log(f"saved physics checkpoint to {checkpoint}")
    return fps


def render_still(cfg: RenderConfig, skybox_name: str, t: float,
                 out_path: str, n_bands: int | None = None,
                 pathtrace: bool = False, seed: int = 0,
                 scene: Scene | None = None,
                 renderer: str = "auto",
                 mesh_spec: str | None = None) -> None:
    """High-res still tier (BASELINE config 2): render one frame at time t
    and write a PPM. Large frames render in horizontal bands
    (render_frame_tiled) so ray-state memory stays bounded. A --mesh spec
    renders the frame over the device mesh instead (row bands ARE the
    memory bound there, so host-side banding is skipped)."""
    from ttrt.render.integrator import render_frame_tiled
    from ttrt.term.encoder import encode_rgb_frame

    if scene is None:
        skybox = assets.load_skybox(skybox_name, cfg.dtype)
        scene = demo_scene(skybox, cfg.width, cfg.height, cfg.dtype)

    mesh = None
    if mesh_spec:
        from ttrt.parallel.sharding import mesh_from_spec

        mesh = mesh_from_spec(mesh_spec)
        if n_bands is not None and n_bands != 1:
            # a mesh still is memory-bounded by its row bands already;
            # refuse rather than silently ignore the explicit flag
            raise ConfigError(
                "--bands does not compose with --mesh (the mesh's row "
                "axis already bands the frame)"
            )

    if mesh is not None and pathtrace:
        from ttrt.parallel.sharding import check_pathtrace_mesh

        check_pathtrace_mesh(cfg, mesh)
        render = None
        n_bands = 1
    elif mesh is not None:
        render = _pick_renderer_sharded(scene, cfg, mesh, renderer)
        n_bands = 1
    else:
        render = None if pathtrace else _pick_renderer(scene, cfg, renderer)
    use_pallas = render is not None and render is not render_frame
    if n_bands is None:
        # auto: band whenever the frame exceeds ~2M rays. The Pallas path
        # needs no banding — its bounce state lives per-tile in VMEM, so
        # frame size only scales the small output arrays.
        n_bands = 1
        if not use_pallas and not pathtrace and (
            cfg.n_primary_rays > 2_000_000
        ):
            n_bands = max(
                d for d in range(1, 17) if cfg.height % d == 0
            )

    # one jit over the WHOLE pipeline (camera pose -> render -> quantize):
    # eager device ops are pathologically slow under remote-compile backends.
    @jax.jit
    def still(s: Scene, tt):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(tt, cfg.dtype)
        )
        s = s.with_camera_frame(frame)
        if pathtrace and mesh is not None:
            from ttrt.parallel.sharding import pathtrace_frame_sharded

            fb = pathtrace_frame_sharded(
                s, default_area_lights(cfg), cfg,
                jax.random.PRNGKey(seed), mesh,
            )
        elif pathtrace:
            from ttrt.render.pathtrace import pathtrace_frame

            fb = pathtrace_frame(
                s, default_area_lights(cfg), cfg, jax.random.PRNGKey(seed)
            )
        elif n_bands > 1:
            fb, _ = render_frame_tiled(s, cfg, n_bands)
        else:
            fb, _ = render(s, cfg)
        return encode_rgb_frame(fb)

    rgb = np.asarray(still(scene, jnp.asarray(t, cfg.dtype)))
    first_output()
    if out_path.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
        from PIL import Image

        Image.fromarray(rgb).save(out_path)
    else:
        assets.write_ppm(out_path, rgb)
    log(f"wrote {out_path} ({cfg.width}x{cfg.height}, bands={n_bands})")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="ttrt", description="Terminal TPU Ray Tracer"
    )
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=280)
    p.add_argument("--spp", type=int, default=10, help="AA rays per pixel")
    p.add_argument("--bounces", type=int, default=10)
    p.add_argument("--fps", type=float, default=60.0, help="target frame rate")
    p.add_argument(
        "--skybox", default="colors",
        help="skybox name or directory (colors, uv_checker, milky_way, ...)",
    )
    p.add_argument("--bilinear", action="store_true",
                   help="bilinear skybox filtering (reference roadmap item)")
    p.add_argument("--specular", action="store_true",
                   help="Blinn-Phong specular highlights (latent in the "
                        "reference: commented-out code)")
    p.add_argument("--energy-model", choices=["parity", "subtract"],
                   default="parity",
                   help="reflectivity mixing model: parity = the "
                        "reference's normalized accumulation; subtract = "
                        "its roadmap model (TerminalRayTracer.c:24-28) "
                        "where reflectivity subtracts from the object's "
                        "own color")
    p.add_argument("--pathtrace", action="store_true",
                   help="Monte-Carlo path tracing with a spherical area "
                        "light: soft shadows + diffuse interreflection")
    p.add_argument("--seed", type=int, default=0,
                   help="RNG seed for --pathtrace")
    p.add_argument("--frames", type=int, default=None,
                   help="stop after N frames (default: run until SIGINT/q)")
    p.add_argument("--still", metavar="OUT.ppm", default=None,
                   help="render a single still to a PPM instead of animating")
    p.add_argument("--time", type=float, default=0.0,
                   help="scene time for --still")
    p.add_argument("--bands", type=int, default=None,
                   help="--still: render in N horizontal bands (bounds "
                        "memory at high resolutions; default auto)")
    p.add_argument("--f64", action="store_true",
                   help="float64 compute (parity/CPU; slow on TPU)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (dev/tests; overrides the "
                        "image's TPU autoselection)")
    p.add_argument("--renderer", choices=["auto", "pallas", "xla"],
                   default="auto",
                   help="render path: the Pallas TPU kernel or the "
                        "fused-XLA integrator (auto picks pallas when "
                        "supported)")
    p.add_argument("--mesh", metavar="RxS[xO]", default=None,
                   help="render over a multi-chip device mesh: 'auto' "
                        "(all devices on the rows axis), ROWSxSAMPLES "
                        "(e.g. 4x2 — rows shard image bands, samples "
                        "shard AA rays, one psum per frame), or "
                        "ROWSxSAMPLESxOBJECTS (e.g. 2x2x2 — adds the "
                        "geometry axis for cluster-packed --scene many); "
                        "the shape must tile the device count")
    p.add_argument("--no-warm-start", action="store_true",
                   help="disable the shallow-bounce warm-start: wait for "
                        "the full-depth kernel compile before the first "
                        "frame (see app.WarmStartStep)")
    p.add_argument("--pipeline", type=int, default=0,
                   help="frames kept in flight with threaded host copies "
                        "(hides host-link latency; camera input lags by N "
                        "frames; 0 = fully synchronous)")
    p.add_argument("--batch", type=int, default=0,
                   help="frames rendered per device program and fetched "
                        "per device->host copy (amortizes the host-link "
                        "round trip; camera input lags by one batch; "
                        "0 = auto: 8 on accelerator backends, 1 on CPU)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler device trace for the run")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans: abort on the first NaN "
                        "produced on device (the data-race-detector analog "
                        "for a lockstep machine)")
    p.add_argument("--stats", action="store_true",
                   help="log per-stage timing summary to stderr on exit")
    p.add_argument("--no-input", action="store_true",
                   help="disable keyboard camera controls")
    p.add_argument(
        "--scene", choices=["demo", "many", "physics"], default="demo",
        help="demo: the reference's 6-sphere scene; many: 10k spheres + "
             "triangle-mesh floor through the uniform grid; physics: GJK "
             "bouncing spheres",
    )
    p.add_argument("--n-spheres", type=int, default=10_000,
                   help="sphere count for --scene many")
    p.add_argument("--scene-file", metavar="JSON", default=None,
                   help="declarative JSON scene description (spheres, "
                        "ground, lights, skybox); see ttrt/scenefile.py")
    p.add_argument("--show-skybox", metavar="NAME", default=None,
                   help="preview a cubemap's six faces in the terminal "
                        "(the reference's print_ppm debug affordance) and "
                        "exit")
    p.add_argument("--checkpoint", default=None,
                   help="physics state checkpoint path (save on exit, "
                        "resume on start)")
    p.add_argument(
        "--encode", choices=["auto", "device", "host"], default="auto",
        help="ANSI encode location: on-device (full escape buffer over the "
             "link) or host (compact RGB + native C encoder); auto picks "
             "host when the native runtime is available",
    )
    args = p.parse_args(argv)

    if args.spp < 1 or args.width < 1 or args.height < 1 or args.bounces < 1:
        p.error("--width/--height/--spp/--bounces must be >= 1")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    # disk-backed compile cache: a restarted process replays identical
    # executables instead of re-compiling (TTRT_COMPILE_CACHE=0 disables)
    from ttrt.utils.compile_cache import enable_compile_cache

    enable_compile_cache(quiet=False)
    # one watchdog over the whole run: armed BEFORE the first jnp array
    # triggers backend init (where a dead remote tunnel blocks silently
    # for minutes); every output path signals first_output()
    try:
        cfg = RenderConfig(
            width=args.width, height=args.height, rays_per_pixel=args.spp,
            bounce_limit=args.bounces, frame_rate=args.fps, dtype=dtype,
            skybox_bilinear=args.bilinear, specular=args.specular,
            energy_model=args.energy_model,
        )
        if args.pathtrace and cfg.energy_model != "parity":
            # the path tracer's BRDF already splits diffuse vs mirror
            # energy by reflectivity; the reflection integrator's mixing
            # models don't apply to it — refuse loudly rather than
            # silently ignore the flag (round-3 bug class)
            raise ConfigError(
                "--energy-model subtract applies to the reflection "
                "integrator, not --pathtrace"
            )
        with StartupWatchdog():
            return _exit_for_teardown(_dispatch(args, cfg))
    except (assets.AssetError, ConfigError, SceneFileError) as e:
        # config refusals (renderer/extension constraints), scene-file
        # and asset errors are user errors: one line, no traceback (the
        # reference exits with a printf the same way,
        # TerminalRayTracer.c:320). Scoped to these classes so internal
        # ValueErrors (e.g. jnp shape bugs) still traceback
        print(f"ttrt: error: {e}", file=sys.stderr)
        return _exit_for_teardown(1)


def _dispatch(args, cfg: RenderConfig) -> int:
    if args.show_skybox:
        import numpy as _np

        from ttrt.term.display import print_ppm

        sky = assets.load_skybox(args.show_skybox, cfg.dtype)
        faces = _np.asarray(sky.to_uint8())
        # 2x3 face contact sheet downscaled to the requested width
        sheet = _np.concatenate(
            [_np.concatenate(list(faces[r * 3:(r + 1) * 3]), axis=1)
             for r in range(2)],
            axis=0,
        )
        step = max(1, sheet.shape[1] // max(args.width, 8))
        print_ppm(sheet[::step * 2, ::step])
        return 0
    file_scene = None
    if args.scene_file:
        from ttrt.scenefile import load_scene_file

        file_scene = load_scene_file(
            args.scene_file, cfg.width, cfg.height, cfg.dtype
        )
    scene = file_scene
    if args.scene == "many":
        from ttrt.mesh import many_sphere_scene

        skybox = assets.load_skybox(args.skybox, cfg.dtype)
        scene = many_sphere_scene(
            skybox, n_spheres=args.n_spheres,
            width_px=cfg.width, height_px=cfg.height, dtype=cfg.dtype,
        )
    if args.mesh and args.scene == "physics":
        raise ConfigError(
            "--mesh does not apply to --scene physics (the physics step "
            "is a single-device program; rendering tiers shard)"
        )
    if args.still:
        # scene (file or many-object) honored: --still --scene many
        # previously fell through to the demo scene silently
        render_still(cfg, args.skybox, args.time, args.still,
                     n_bands=args.bands, pathtrace=args.pathtrace,
                     seed=args.seed, scene=scene,
                     renderer=args.renderer, mesh_spec=args.mesh)
        return 0
    if args.scene == "physics":
        run_physics(cfg, args.skybox, args.frames,
                    interactive=not args.no_input, encode=args.encode,
                    checkpoint=args.checkpoint)
        return 0
    run_animation(cfg, args.skybox, args.frames,
                  interactive=not args.no_input, encode=args.encode,
                  scene=scene, profile_dir=args.profile,
                  stats=args.stats, pipeline=args.pipeline,
                  pathtrace=args.pathtrace, seed=args.seed,
                  renderer=args.renderer, batch=args.batch,
                  warm_start=not args.no_warm_start,
                  mesh_spec=args.mesh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
