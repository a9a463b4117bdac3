"""TTFF with the persistent compilation cache — VERDICT r3 item 5.

Question: does `jax_compilation_cache_dir` survive the axon remote
backend?  PJRT plugins that compile REMOTELY and never hand the client a
serializable executable defeat the disk cache; measure, don't assume.

Experiment: run the SAME child program (fresh process each time) twice:
  run 1 — compiles (populates ~/.cache/ttrt-jax if the backend allows)
  run 2 — identical program; a working cache turns the compile into a
          disk read + executable upload.
The child times import -> backend init -> trace+compile -> first frame
fetched (the honest TTFF the app's user feels), on the app's streaming
path (240x64x10spp bounce-10, production Pallas kernel, batch=1,
no warm-start so the FULL-DEPTH compile is what we time).

Usage:  python scratch/ttff_cache.py              # both runs + verdict
        python scratch/ttff_cache.py --child N    # one timed child run
The run index N perturbs the camera inputs: the axon tunnel caches
results by (executable, input values), so identical inputs in run 2
would measure the RESULT cache, not the compile cache (ADVICE r4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def child(run_idx: int) -> None:
    t0 = time.perf_counter()
    from ttrt.utils.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache(quiet=True)
    import jax
    import jax.numpy as jnp

    jax.devices()  # backend init
    t_backend = time.perf_counter() - t0

    from ttrt.assets import make_colors_skybox, skybox_from_faces
    from ttrt.config import RenderConfig
    from ttrt.scene import demo_scene
    from ttrt.app import build_frame_batch_step

    cfg = RenderConfig(width=240, height=64, rays_per_pixel=10,
                       bounce_limit=10)
    scene = demo_scene(
        skybox_from_faces(make_colors_skybox(256), cfg.dtype,
                          procedural="colors"),
        cfg.width, cfg.height, cfg.dtype,
    )
    step = build_frame_batch_step(scene, cfg, 1, "pallas")
    # fresh input values per run: the tunnel caches results by
    # (executable, input values) — identical inputs would let run 2 skip
    # EXECUTION via the result cache and fake a compile-cache win
    t_cam = jnp.asarray(2.0 + 13.7 * run_idx, cfg.dtype)
    off = jnp.asarray([0.01 * run_idx, 0.0, 0.0], cfg.dtype)
    out = step(t_cam, off)
    jax.block_until_ready(out)
    t_ready = time.perf_counter() - t0
    # the frame isn't "painted" until the host has the bytes
    import numpy as np

    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_first_frame = time.perf_counter() - t0
    print(json.dumps({
        "backend_init_s": round(t_backend, 1),
        "compiled_s": round(t_ready, 1),
        "ttff_s": round(t_first_frame, 1),
        "cache_dir": cache_dir,
        "cache_entries": len(os.listdir(cache_dir)) if cache_dir else 0,
    }))


def main() -> None:
    # fresh cache dir: the shared default (~/.cache/ttrt-jax) is already
    # populated by bench/CLI runs, which would make run 1 warm too
    import tempfile

    cache_dir = tempfile.mkdtemp(prefix="ttff-cache-")
    env = dict(os.environ, TTRT_COMPILE_CACHE=cache_dir)
    print(json.dumps({"fresh_cache_dir": cache_dir}), flush=True)
    results = []
    for i in (1, 2):
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, __file__, "--child", str(i)],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        wall = time.perf_counter() - t0
        line = (p.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            r = {"error": p.stdout[-300:] + p.stderr[-300:]}
        r["run"] = i
        r["wall_s"] = round(wall, 1)
        results.append(r)
        print(json.dumps(r), flush=True)
    if all("ttff_s" in r for r in results):
        speedup = results[0]["ttff_s"] / max(results[1]["ttff_s"], 1e-9)
        print(f"verdict: run2/run1 TTFF {results[1]['ttff_s']}s / "
              f"{results[0]['ttff_s']}s ({speedup:.1f}x)"
              + (" — cache WORKS across processes" if speedup > 1.5
                 else " — cache does NOT help (remote compile not cached "
                      "client-side, or floor dominated by first-fetch)"))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
