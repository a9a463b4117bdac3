"""10k-tier fused-kernel roofline breakdown (re-landed round 5).

Round 3 measured the bound that BASELINE.md's 10k-interior amendment
rests on with this experiment; the original script lived only on the
round-3/4 VM's disk and died with it, leaving BASELINE.md citing a file
that no longer existed. This is the committed re-creation.

Three on-chip variants of the SAME fused kernel on the bench 10k scene
(``debug_sweep`` knob, mesh_fused.py):
  - dead: every (tile, subcluster, phase) section culled — sweep
    bookkeeping + launch floor, zero narrow-phase bodies;
  - all:  every section forced live — the all-pairs VPU body ceiling;
  - None: production culling.
Round-3 numbers: dead 1-2 ms, all 21-24 ms, production within ~1.5x of
'all' because the interior camera sees ~82% live sections.

Timing uses bench.py's hardened slope method (CLAUDE.md rule: plain
enqueue-N loops measured a ~90 ms per-batch sync tax in round 2).

Usage: python scratch/fused_breakdown.py [n_spheres=10000] [fly] [hier|flat]
  'fly' switches to the bench's exterior fly-over camera (origin x20,
  orbit window base 2100) — the 100k tier's datum. 'hier'/'flat' force
  the two-level sweep on/off (default: the kernel's auto threshold) —
  the round-5 datum behind HIERARCHY_MIN_SUBCLUSTERS.
"""
import functools
import sys

sys.path.insert(0, ".")  # repo root (run from /root/repo)

import jax
import jax.numpy as jnp

import bench
from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.mesh_fused import render_frame_mesh_fused
from ttrt.mesh import many_sphere_scene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
fly = "fly" in sys.argv[2:]
hier = {"hier": True, "flat": False}.get(
    sys.argv[-1] if len(sys.argv) > 2 else "", None
)
cfg = RenderConfig(width=240, height=64, rays_per_pixel=2,
                   bounce_limit=3, dtype=jnp.float32)
scene = many_sphere_scene(
    skybox_from_faces(make_colors_skybox(64), jnp.float32),
    n_spheres=n, width_px=cfg.width, height_px=cfg.height,
)


def make_step(sweep):
    @jax.jit
    def step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        if fly:
            frame = frame._replace(origin=frame.origin * 20.0)
        fb, rays = render_frame_mesh_fused(
            scene.with_camera_frame(frame), cfg, debug_sweep=sweep,
            hierarchy=hier,
        )
        return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays
    return step


series = bench.TimeSeries(jnp.float32, base=2100.0 if fly else 1300.0,
                          step=0.21)
print(f"n_spheres={n} subclusters="
      f"{scene.clusters.kb_sph + scene.clusters.kb_tri}", flush=True)
for sweep in ("dead", "all", None):
    step = make_step(sweep)
    sec, outs, pers = bench._throughput(
        step, scene, series, n_small=3, n_big=9, repeats=3
    )
    rays = bench._mean_rays(outs)  # outs = the kept big batch's outputs
    print(f"sweep={sweep!s:>4}: frame {sec * 1e3:7.2f} ms "
        f"(runs {[round(p * 1e3, 2) for p in pers]}) "
        f"rays/frame {rays} -> {rays / sec / 1e6:6.1f} Mray/s", flush=True)
