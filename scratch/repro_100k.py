"""Reproduce BENCH_r04's 100k-tier remote-compile failure and capture
the FULL error (the bench tail truncated the VMEM allocation dump).

Builds the bench_many_object_100k scene + step and compiles it once.
"""
import sys
import time

import jax
import jax.numpy as jnp

from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.mesh_fused import render_frame_mesh_fused
from ttrt.mesh import many_sphere_scene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

cfg = RenderConfig(width=240, height=64, rays_per_pixel=2,
                   bounce_limit=3, dtype=jnp.float32)
print(f"building {n}-sphere scene ...", flush=True)
scene = many_sphere_scene(
    skybox_from_faces(make_colors_skybox(64), jnp.float32),
    n_spheres=n, width_px=cfg.width, height_px=cfg.height,
)
print(f"kb_sph={scene.clusters.kb_sph} kb_tri={scene.clusters.kb_tri} "
      f"sph_pack={scene.clusters.sph.shape} qbox={scene.clusters.sph_lo_q.shape}",
      flush=True)


@jax.jit
def step_fly(scene, t):
    frame = jax.tree.map(
        lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
    )
    frame = frame._replace(origin=frame.origin * 20.0)
    fb, rays = render_frame_mesh_fused(scene.with_camera_frame(frame), cfg)
    return fb.x.sum() + fb.y.sum() + fb.z.sum(), rays

t0 = time.perf_counter()
try:
    out = step_fly(scene, jnp.asarray(2100.0, jnp.float32))
    jax.block_until_ready(out)
    print(f"COMPILED+RAN ok in {time.perf_counter()-t0:.0f}s; "
          f"sum={float(out[0]):.3f} rays={float(out[1]):.0f}", flush=True)
except Exception as e:
    print(f"FAILED after {time.perf_counter()-t0:.0f}s", flush=True)
    print(str(e)[:20000], flush=True)
