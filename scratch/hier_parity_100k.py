"""On-chip image parity: hierarchical vs flat sweep at the 100k tier.

The round-5 hierarchical sweep measured a 27-trace difference out of
233k at 100k spheres (0.01%) — the documented visit-order caveat (exact
float-t ties between objects in different subclusters resolve to the
first-visited). This script quantifies the IMAGE impact on the bench's
fly-over datum: quantized-u8 flip fraction and max float delta between
hierarchy=True and hierarchy=False frames on the real chip. (The CPU
interpret test asserts BITWISE equality on a 36-subcluster scene —
tie-free at that scale; at 792 subclusters ties are expected and the
flips must be knife-sparse.)

Usage: python scratch/hier_parity_100k.py [n_spheres=100000]
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.assets import make_colors_skybox, skybox_from_faces
from ttrt.config import RenderConfig
from ttrt.frames import orbit_camera_frame
from ttrt.kernels.mesh_fused import render_frame_mesh_fused
from ttrt.mesh import many_sphere_scene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
cfg = RenderConfig(width=240, height=64, rays_per_pixel=2,
                   bounce_limit=3, dtype=jnp.float32)
scene = many_sphere_scene(
    skybox_from_faces(make_colors_skybox(64), jnp.float32),
    n_spheres=n, width_px=cfg.width, height_px=cfg.height,
)


def render(hier, t):
    @jax.jit
    def step(scene, t):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(t, cfg.dtype)
        )
        frame = frame._replace(origin=frame.origin * 20.0)
        fb, rays = render_frame_mesh_fused(
            scene.with_camera_frame(frame), cfg, hierarchy=hier
        )
        return fb.to_array(), rays

    fb, rays = step(scene, jnp.asarray(t, jnp.float32))
    return np.asarray(fb, np.float64), int(rays)


for t in (2100.0, 2133.0):
    a, ra = render(False, t)
    b, rb = render(True, t)
    qa = np.clip((a * 255.0), 0, 255).astype(np.uint8)
    qb = np.clip((b * 255.0), 0, 255).astype(np.uint8)
    flips = (qa != qb).any(axis=-1)
    print(
        f"t={t}: traces flat={ra} hier={rb} (delta {rb - ra}); "
        f"quantized flips {int(flips.sum())}/{flips.size} px "
        f"({flips.mean():.3%}); max|d| {np.abs(a - b).max():.3e}",
        flush=True,
    )
