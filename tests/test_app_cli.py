"""End-to-end CLI drives (CPU backend, tiny configs): the animation loop,
the physics tier, the many-object tier, checkpoint round-trip, and the ANSI
stream contract."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CELL_RE = re.compile(rb"\x1b\[48;2;(\d{3});(\d{3});(\d{3})m  \x1b\[0m")


def _run(args, timeout=420):
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable, "-m", "ttrt", "--cpu", "--no-input", *args],
        cwd=REPO, env=env, capture_output=True, timeout=timeout,
    )


def _check_stream(out: bytes, frames: int, w: int, h: int):
    got_frames = out.count(b"\x1b[0;0H\x1b[48;2;")
    got_cells = len(CELL_RE.findall(out))
    assert out.startswith(b"\x1b[?25l"), out[:20]
    assert got_frames == frames, (got_frames, frames, len(out))
    assert got_cells == frames * w * h, (got_cells, frames * w * h)
    assert b"\x1b[?25h" in out[-40:], out[-40:]
    assert b" fps\n" in out, len(out)


@pytest.mark.parametrize("encode", ["device", "host"])
def test_animation_stream(encode):
    w, h, frames = 24, 10, 3
    r = _run([
        "--width", str(w), "--height", str(h), "--spp", "2",
        "--frames", str(frames), "--skybox", "colors", "--fps", "1000",
        "--encode", encode,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, frames, w, h)


def test_physics_scene_runs_and_checkpoints(tmp_path):
    w, h, frames = 16, 8, 2
    ckpt = str(tmp_path / "phys.npz")
    r = _run([
        "--scene", "physics", "--width", str(w), "--height", str(h),
        "--spp", "1", "--frames", str(frames), "--skybox", "colors",
        "--fps", "1000", "--checkpoint", ckpt,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, frames, w, h)
    assert os.path.exists(ckpt)
    t1 = float(np.load(ckpt)["arr_6"])  # last leaf = t (pos3, vel3, t)

    # resume: sim time continues from the checkpoint
    r2 = _run([
        "--scene", "physics", "--width", str(w), "--height", str(h),
        "--spp", "1", "--frames", str(frames), "--skybox", "colors",
        "--fps", "1000", "--checkpoint", ckpt,
    ])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert b"resumed physics state" in r2.stderr
    t2 = float(np.load(ckpt)["arr_6"])
    assert t2 > t1


def test_many_scene_runs():
    r = _run([
        "--scene", "many", "--n-spheres", "128", "--width", "16",
        "--height", "8", "--spp", "1", "--frames", "2",
        "--skybox", "colors", "--fps", "1000", "--bounces", "3",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, 2, 16, 8)


def test_still_ppm(tmp_path):
    out = str(tmp_path / "still.ppm")
    r = _run([
        "--still", out, "--width", "32", "--height", "16", "--spp", "1",
        "--time", "1.0", "--skybox", "uv_checker",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, "rb") as f:
        header = f.readline()
        dims = f.readline()
    assert header.strip() == b"P6"
    assert dims.strip() == b"32 16"


def test_still_many_scene(tmp_path):
    """--still honors --scene many (previously fell through to the demo
    scene silently): the rendered image must differ from the demo still
    at identical settings."""
    out_many = str(tmp_path / "many.ppm")
    out_demo = str(tmp_path / "demo.ppm")
    common = ["--width", "32", "--height", "16", "--spp", "1",
              "--time", "1.0", "--skybox", "colors"]
    r = _run(["--still", out_many, "--scene", "many",
              "--n-spheres", "64", *common])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run(["--still", out_demo, *common])
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out_many, "rb") as f:
        many = f.read()
    with open(out_demo, "rb") as f:
        demo = f.read()
    assert many[:15] != b"" and many != demo


def test_bad_flags_rejected():
    r = _run(["--width", "0"])
    assert r.returncode == 2


def _run_mesh(args, timeout=420):
    """CLI run with a virtual 8-device CPU mesh (the subprocess analog of
    conftest's XLA_FLAGS; --cpu still switches the backend in-process)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    return subprocess.run(
        [sys.executable, "-m", "ttrt", "--cpu", "--no-input", *args],
        cwd=REPO, env=env, capture_output=True, timeout=timeout,
    )


class TestMeshCLI:
    """--mesh: the multi-chip renderers are user-reachable from the app
    (rows shard image bands, samples shard AA rays)."""

    def test_mesh_animation_stream(self):
        w, h, frames = 24, 16, 2
        r = _run_mesh([
            "--mesh", "4x2", "--width", str(w), "--height", str(h),
            "--spp", "2", "--frames", str(frames), "--skybox", "colors",
            "--fps", "1000",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        _check_stream(r.stdout, frames, w, h)

    def test_mesh_still_matches_single_device(self, tmp_path):
        """f64 sharded still == unsharded still to <= 1 u8 LSB per
        channel (the psum reassociates the sample sum ~1e-16 from the
        sequential order, so a pixel sitting exactly on a truncation
        boundary may flip one step; observed byte-identical today)."""
        out_m = str(tmp_path / "mesh.ppm")
        out_1 = str(tmp_path / "one.ppm")
        common = ["--f64", "--width", "32", "--height", "16", "--spp", "4",
                  "--time", "1.0", "--skybox", "colors"]
        r = _run_mesh(["--mesh", "2x4", "--still", out_m, *common])
        assert r.returncode == 0, r.stderr[-2000:]
        r = _run(["--still", out_1, *common])
        assert r.returncode == 0, r.stderr[-2000:]

        def pixels(path):
            with open(path, "rb") as f:
                assert f.readline().strip() == b"P6"
                assert f.readline().strip() == b"32 16"
                assert f.readline().strip() == b"255"
                return np.frombuffer(f.read(), np.uint8).astype(np.int32)

        diff = np.abs(pixels(out_m) - pixels(out_1))
        assert diff.max() <= 1, f"max channel diff {diff.max()}"

    def test_mesh_many_scene(self):
        r = _run_mesh([
            "--mesh", "4x2", "--scene", "many", "--n-spheres", "64",
            "--width", "24", "--height", "16", "--spp", "2",
            "--bounces", "3", "--frames", "2", "--skybox", "colors",
            "--fps", "1000",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        _check_stream(r.stdout, 2, 24, 16)

    def test_mesh_pathtrace(self):
        r = _run_mesh([
            "--mesh", "auto", "--pathtrace", "--spp", "8",
            "--width", "16", "--height", "8", "--frames", "2",
            "--fps", "1000",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        _check_stream(r.stdout, 2, 16, 8)

    def test_mesh_bad_shape_one_line_error(self):
        r = _run_mesh(["--mesh", "3x2", "--frames", "1"])
        assert r.returncode == 1
        assert b"needs 6 devices" in r.stderr

    def test_mesh_indivisible_height_one_line_error(self):
        r = _run_mesh(["--mesh", "8x1", "--height", "10", "--width", "16",
                       "--spp", "1", "--frames", "1"])
        assert r.returncode == 1
        assert b"not divisible" in r.stderr

    def test_mesh_physics_refused(self):
        r = _run_mesh(["--mesh", "auto", "--scene", "physics",
                       "--frames", "1"])
        assert r.returncode == 1
        assert b"--mesh does not apply" in r.stderr

    @pytest.mark.slow
    def test_mesh_objects_axis_animation(self):
        """--mesh 2x2x2: the composed rows x samples x objects mesh —
        geometry sharded over Morton subcluster slices, combined with
        the per-trace pmin (interpret-mode cluster kernel on the CPU
        mesh, hence slow)."""
        w, h, frames = 16, 8, 2
        r = _run_mesh([
            "--mesh", "2x2x2", "--scene", "many", "--n-spheres", "64",
            "--width", str(w), "--height", str(h), "--spp", "2",
            "--bounces", "2", "--frames", str(frames),
            "--skybox", "colors", "--fps", "1000",
        ], timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        _check_stream(r.stdout, frames, w, h)

    def test_mesh_objects_axis_needs_many_scene(self):
        r = _run_mesh(["--mesh", "2x2x2", "--frames", "1"])
        assert r.returncode == 1
        assert b"objects factor" in r.stderr

    def test_mesh_objects_axis_refused_for_pathtrace(self):
        r = _run_mesh(["--mesh", "2x2x2", "--pathtrace", "--spp", "8",
                       "--frames", "1"])
        assert r.returncode == 1
        assert b"shards samples, not geometry" in r.stderr


def test_energy_model_subtract_still(tmp_path):
    """--energy-model subtract (the reference's roadmap reflectivity
    model, TerminalRayTracer.c:24-28) renders and visibly differs from
    the parity model at identical settings."""
    out_s = str(tmp_path / "sub.ppm")
    out_p = str(tmp_path / "par.ppm")
    common = ["--width", "32", "--height", "16", "--spp", "1",
              "--time", "1.0", "--skybox", "colors"]
    r = _run(["--still", out_s, "--energy-model", "subtract", *common])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run(["--still", out_p, *common])
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out_s, "rb") as f:
        sub = f.read()
    with open(out_p, "rb") as f:
        par = f.read()
    assert sub[:2] == b"P6" and sub != par


def test_energy_model_refused_with_pathtrace():
    """The path tracer's BRDF already splits energy by reflectivity —
    the flag must be refused loudly (one-line error), not silently
    ignored."""
    r = _run(["--pathtrace", "--energy-model", "subtract",
              "--width", "16", "--height", "8", "--spp", "1",
              "--frames", "1"])
    assert r.returncode == 1
    assert b"energy-model" in r.stderr


@pytest.mark.parametrize("pipeline", [2])
def test_animation_stream_pipelined(pipeline):
    """Pipelined mode must still emit exactly --frames valid frames."""
    w, h, frames = 24, 10, 4
    r = _run([
        "--width", str(w), "--height", str(h), "--spp", "2",
        "--frames", str(frames), "--skybox", "colors", "--fps", "1000",
        "--encode", "device", "--pipeline", str(pipeline),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, frames, w, h)


def test_pathtrace_still(tmp_path):
    out = str(tmp_path / "pt.ppm")
    r = _run([
        "--still", out, "--pathtrace", "--width", "24", "--height", "12",
        "--spp", "4", "--bounces", "3", "--skybox", "colors",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) > 24 * 12 * 3


def test_pathtrace_animation():
    r = _run([
        "--pathtrace", "--width", "16", "--height", "8", "--spp", "2",
        "--bounces", "3", "--frames", "2", "--skybox", "colors",
        "--fps", "1000", "--encode", "device",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, 2, 16, 8)


def test_specular_flag_runs():
    r = _run([
        "--specular", "--width", "16", "--height", "8", "--spp", "1",
        "--frames", "1", "--skybox", "colors", "--fps", "1000",
        "--encode", "device",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, 1, 16, 8)


class TestRendererRouting:
    """_pick_renderer: each scene type routes to its production kernel
    on a TPU backend; extensions the kernels don't serve fall back to
    the XLA integrator (the oracle)."""

    def _demo_scene(self, procedural="colors"):
        import jax.numpy as jnp

        from ttrt.assets import make_colors_skybox, skybox_from_faces
        from ttrt.scene import demo_scene

        sky = skybox_from_faces(make_colors_skybox(8), jnp.float32,
                                procedural=procedural)
        return demo_scene(sky, 16, 8, jnp.float32)

    def _mesh_scene(self):
        import jax.numpy as jnp

        from ttrt.assets import make_colors_skybox, skybox_from_faces
        from ttrt.mesh import many_sphere_scene

        sky = skybox_from_faces(make_colors_skybox(8), jnp.float32,
                                procedural="colors")
        return many_sphere_scene(sky, n_spheres=32, width_px=16,
                                 height_px=8)

    def _cfg(self, **kw):
        import jax.numpy as jnp

        from ttrt.config import RenderConfig

        kw.setdefault("dtype", jnp.float32)
        return RenderConfig(width=16, height=8, rays_per_pixel=2,
                            bounce_limit=2, **kw)

    @pytest.fixture
    def tpu_backend(self, monkeypatch):
        import ttrt.app as app

        monkeypatch.setattr(app.jax, "default_backend", lambda: "tpu")

    def test_sharded_picker_matches_unsharded_routing(self, tpu_backend):
        """_pick_renderer_sharded must route by the SAME gates as
        _pick_renderer (shared _kernel_gates): demo scene -> band
        Pallas kernel, cluster-packed MeshScene -> fused kernel."""
        from ttrt.app import _pick_renderer_sharded
        from ttrt.parallel.sharding import (
            make_mesh,
            render_frame_sharded_mesh_fused,
            render_frame_sharded_pallas,
        )

        mesh = make_mesh(4, 2)
        cfg = self._cfg()
        picked = _pick_renderer_sharded(self._demo_scene(), cfg, mesh)
        assert picked.func is render_frame_sharded_pallas
        picked = _pick_renderer_sharded(self._mesh_scene(), cfg, mesh)
        assert picked.func is render_frame_sharded_mesh_fused

    def test_pathtrace_mesh_routes_to_sharded_kernel(self, tpu_backend,
                                                     monkeypatch):
        """--pathtrace --mesh must keep the single-chip kernel routing:
        the per-device estimator is the counter-RNG Pallas sampler when
        eligible, not a silent demotion to the XLA estimator (review
        finding, 2026-08-18)."""
        import ttrt.parallel.sharding as shd
        from ttrt.app import build_pathtrace_frame_step
        from ttrt.parallel.sharding import make_mesh
        from ttrt.vec import Vec3
        import jax.numpy as jnp
        import numpy as np

        calls = []

        def stub(scene, lights, cfg, fseed, mesh, **kw):
            calls.append(mesh)
            z = jnp.zeros((cfg.height, cfg.width), jnp.float32)
            return Vec3(z, z, z)

        monkeypatch.setattr(shd, "pathtrace_frame_sharded_pallas", stub)
        mesh = make_mesh(4, 2)
        cfg = self._cfg().with_(rays_per_pixel=8)
        step = build_pathtrace_frame_step(self._demo_scene(), cfg,
                                          encode="host", mesh=mesh)
        out = step(jnp.float32(0.1), jnp.zeros(3, jnp.float32))
        assert calls, "sharded Pallas pathtrace sampler was not routed to"
        assert np.asarray(out).shape[0] == cfg.height

    def test_demo_scene_routes_to_pallas(self, tpu_backend):
        from ttrt.app import _pick_renderer
        from ttrt.kernels.render_pallas import render_frame_pallas

        assert _pick_renderer(
            self._demo_scene(), self._cfg()
        ) is render_frame_pallas

    def test_demo_scene_specular_stays_pallas(self, tpu_backend):
        # round-3 in-kernel specular: the flag must not demote the path
        from ttrt.app import _pick_renderer
        from ttrt.kernels.render_pallas import render_frame_pallas

        assert _pick_renderer(
            self._demo_scene(), self._cfg(specular=True)
        ) is render_frame_pallas

    def test_mesh_scene_routes_to_fused_kernel(self, tpu_backend):
        from ttrt.app import _pick_renderer
        from ttrt.kernels.mesh_fused import render_frame_mesh_fused

        assert _pick_renderer(
            self._mesh_scene(), self._cfg()
        ) is render_frame_mesh_fused

    def test_mesh_scene_specular_stays_fused(self, tpu_backend):
        # round-4 in-kernel specular on the fused mesh kernel (VERDICT
        # r3 #6): the flag must not demote the many-object path
        from ttrt.app import _pick_renderer
        from ttrt.kernels.mesh_fused import render_frame_mesh_fused

        assert _pick_renderer(
            self._mesh_scene(), self._cfg(specular=True)
        ) is render_frame_mesh_fused

    def test_pathtrace_routes_to_kernel(self, tpu_backend, monkeypatch):
        """build_pathtrace_frame_step must use the Pallas sampler when
        eligible (ADVICE r3: the app previously always took the XLA
        estimator while docs called the kernel 'production')."""
        import ttrt.kernels.pathtrace_pallas as ptp
        from ttrt.app import build_pathtrace_frame_step
        from ttrt.vec import Vec3
        import jax.numpy as jnp
        import numpy as np

        calls = []

        def stub(scene, lights, cfg, seed, **kw):
            calls.append(cfg)
            z = jnp.zeros((cfg.height, cfg.width), jnp.float32)
            return Vec3(z, z, z)

        monkeypatch.setattr(ptp, "pathtrace_frame_pallas", stub)
        cfg = self._cfg()
        step = build_pathtrace_frame_step(self._demo_scene(), cfg,
                                          encode="host")
        out = step(jnp.float32(0.1), jnp.zeros(3, jnp.float32))
        assert calls, "Pallas pathtrace kernel was not routed to"
        assert np.asarray(out).shape[0] == cfg.height

    def test_pathtrace_image_skybox_uses_xla(self, tpu_backend):
        # image cubemaps are XLA-owned on the pathtrace tier: the
        # builder must not raise, and must route around the kernel
        from ttrt.app import build_pathtrace_frame_step

        step = build_pathtrace_frame_step(
            self._demo_scene(procedural=None), self._cfg(), encode="host"
        )
        assert step is not None

    def test_bilinear_procedural_stays_pallas(self, tpu_backend):
        # bilinear is gather-free for procedural skies: served in-kernel
        from ttrt.app import _pick_renderer
        from ttrt.kernels.render_pallas import render_frame_pallas

        assert _pick_renderer(
            self._demo_scene(), self._cfg(skybox_bilinear=True)
        ) is render_frame_pallas

    def test_bilinear_image_skybox_stays_pallas(self, tpu_backend):
        # round-4 (VERDICT r3 #7): image-cubemap bilinear is served on
        # the demo kernel via the deferred 4-tap epilogue — the flag
        # must no longer demote the path
        from ttrt.app import _pick_renderer
        from ttrt.kernels.render_pallas import render_frame_pallas

        assert _pick_renderer(
            self._demo_scene(procedural=None),
            self._cfg(skybox_bilinear=True),
        ) is render_frame_pallas

    def test_bilinear_image_mesh_scene_stays_fused(self, tpu_backend):
        # the fused mesh kernel serves image-cubemap bilinear via the
        # deferred 4-tap epilogue (round 4) — no demotion
        import jax.numpy as jnp

        from ttrt.app import _pick_renderer
        from ttrt.assets import make_colors_skybox, skybox_from_faces
        from ttrt.kernels.mesh_fused import render_frame_mesh_fused
        from ttrt.mesh import many_sphere_scene

        sky = skybox_from_faces(make_colors_skybox(8), jnp.float32)
        scene = many_sphere_scene(sky, n_spheres=32, width_px=16,
                                  height_px=8)
        assert _pick_renderer(
            scene, self._cfg(skybox_bilinear=True)
        ) is render_frame_mesh_fused

    def test_cpu_backend_uses_xla(self):
        from ttrt.app import _pick_renderer
        from ttrt.render.integrator import render_frame

        assert _pick_renderer(
            self._demo_scene(), self._cfg()
        ) is render_frame

    def test_explicit_pallas_raises_when_unavailable(self, tpu_backend):
        import jax.numpy as jnp

        from ttrt.app import _pick_renderer

        with pytest.raises(ValueError):
            _pick_renderer(self._demo_scene(),
                           self._cfg(dtype=jnp.float64), "pallas")


def test_unavailable_renderer_clean_error():
    """Config refusals exit 1 with a one-line error, not a traceback."""
    r = _run(["--renderer", "pallas", "--frames", "1",
              "--width", "16", "--height", "8"])
    assert r.returncode == 1
    assert b"ttrt: error:" in r.stderr
    assert b"Traceback" not in r.stderr


def test_animation_stream_batched_warm_start():
    """Forced --batch exercises _run_animation_batched end-to-end on CPU
    (auto-batch picks 1 there, so CI never entered this loop): batched
    device programs, pipelined fetches, host ANSI expansion, and the
    WarmStartStep wrapper (bounces > WARM_BOUNCE_LIMIT arms the shallow
    kernel + background deep compile)."""
    w, h, frames = 24, 10, 6
    r = _run([
        "--width", str(w), "--height", str(h), "--spp", "1",
        "--frames", str(frames), "--skybox", "colors", "--fps", "1000",
        "--batch", "3", "--bounces", "6",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, frames, w, h)


def test_warm_start_step_swaps_to_deep():
    """WarmStartStep streams the shallow variant immediately and swaps in
    the full-depth step when its background compile lands."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from ttrt.app import WARM_BOUNCE_LIMIT, WarmStartStep
    from ttrt.assets import make_colors_skybox, skybox_from_faces
    from ttrt.config import RenderConfig
    from ttrt.scene import demo_scene

    cfg = RenderConfig(width=16, height=8, rays_per_pixel=1,
                       bounce_limit=WARM_BOUNCE_LIMIT + 2,
                       dtype=jnp.float32)
    scene = demo_scene(
        skybox_from_faces(make_colors_skybox(8), jnp.float32,
                          procedural="colors"),
        cfg.width, cfg.height, jnp.float32,
    )
    step = WarmStartStep(scene, cfg, batch=2, renderer="xla")
    assert step.warming  # shallow first
    out = np.asarray(step(jnp.zeros((), jnp.float32),
                          jnp.zeros(3, jnp.float32)))
    assert out.shape == (2, cfg.height, cfg.width, 3)
    deadline = _time.monotonic() + 120.0
    while step.warming and _time.monotonic() < deadline:
        _time.sleep(0.5)
    assert not step.warming, "deep compile never swapped in"
    out2 = np.asarray(step(jnp.ones((), jnp.float32),
                           jnp.zeros(3, jnp.float32)))
    assert out2.shape == (2, cfg.height, cfg.width, 3)


def test_f64_animation_runs():
    """--f64 routes to the XLA path at float64 (extension; the reference
    is f32-only) and still honors the stream contract."""
    w, h = 16, 8
    r = _run([
        "--f64", "--width", str(w), "--height", str(h), "--spp", "1",
        "--frames", "1", "--skybox", "colors", "--fps", "1000",
        "--encode", "device",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    _check_stream(r.stdout, 1, w, h)


def test_exit_for_teardown_guards_live_compile_threads(monkeypatch):
    """A background deep-compile thread still inside the backend's C++
    RPC at interpreter exit cannot be joined or cancelled — CPython
    killing it mid-RPC aborts the process (observed on the remote
    backend: 'FATAL: exception not rethrown', rc=134, AFTER a valid
    stream). _exit_for_teardown must os._exit(rc) while such a thread
    lives and be a no-op passthrough otherwise."""
    import threading

    from ttrt import app

    calls = []
    monkeypatch.setattr(app.os, "_exit", lambda rc: calls.append(rc))

    monkeypatch.setattr(app, "_bg_compile_threads", [])
    assert app._exit_for_teardown(0) == 0
    assert calls == []

    release = threading.Event()
    t = threading.Thread(target=release.wait, daemon=True)
    t.start()
    monkeypatch.setattr(app, "_bg_compile_threads", [t])
    try:
        app._exit_for_teardown(3)
        assert calls == [3]
    finally:
        release.set()
        t.join(5)
    # a finished thread no longer forces the hard exit
    app._exit_for_teardown(0)
    assert calls == [3]
