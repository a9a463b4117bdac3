"""Physics-tier demo: the six demo spheres dropped under gravity, GJK
contacts, rendered by the SAME scene/render stack — physics step and render
fused into one jitted frame function (BASELINE.json config 5).

State is an explicit pytree (PhysicsState), so checkpoint/resume is a
numpy savez round-trip (SURVEY.md §5 checkpoint contract).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.config import RenderConfig
from ttrt.frames import Frame, orbit_camera_frame
from ttrt.physics.world import (
    PhysicsParams,
    PhysicsState,
    default_params,
    physics_step,
)
from ttrt.render.integrator import render_frame
from ttrt.scene import Scene, demo_scene
from ttrt.vec import Vec3


def build_physics_demo(
    scene: Scene, dtype=jnp.float32
) -> Tuple[PhysicsState, PhysicsParams]:
    """Start from the demo scene's sphere ring, lifted and given a small
    tangential kick so the drop breaks symmetry."""
    c = scene.spheres.center
    n = scene.spheres.count
    pos = Vec3(c.x * 2.0, c.y * 1.5 + 3.0, c.z * 2.0)
    # tangential kick: v = (z, 0, -x) * 0.8
    vel = Vec3(c.z * 0.8, jnp.zeros_like(c.y), -c.x * 0.8)
    state = PhysicsState(pos=pos, vel=vel, t=jnp.asarray(0.0, dtype))
    params = default_params(
        scene.spheres.radius, dtype=dtype, ground_y=-2.0, restitution=0.8,
        bounds=4.0,
    )
    return state, params


def build_physics_frame_step(
    scene: Scene, cfg: RenderConfig, params: PhysicsParams,
    encode: str = "device", substeps: int = 4,
):
    """jit: (state, cam_offset) -> (new_state, frame bytes). The physics
    substeps, the render, and the encode are ONE device program — zero
    host round-trips inside a frame."""
    from ttrt.term.encoder import encode_ansi_frame, encode_rgb_frame

    enc = encode_ansi_frame if encode == "device" else encode_rgb_frame
    dt = jnp.asarray(cfg.frame_duration, cfg.dtype)

    @jax.jit
    def frame_step(state: PhysicsState, cam_offset):
        state = physics_step(state, params, dt, substeps=substeps)
        frame = orbit_camera_frame(state.t * 0.3, cfg.dtype)
        frame = frame._replace(
            origin=(frame.origin * 3.0).astype(cfg.dtype) + cam_offset
        )
        s = scene._replace(
            spheres=scene.spheres._replace(center=state.pos)
        ).with_camera_frame(frame)
        fb, _ = render_frame(s, cfg)
        return state, enc(fb)

    return frame_step


def _ckpt_path(path: str) -> str:
    """np.savez appends '.npz' when missing; normalize so save and load
    always agree on the on-disk name (a bare '--checkpoint state.ckpt'
    must round-trip)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, state: PhysicsState) -> None:
    leaves, _ = jax.tree.flatten(state)
    np.savez(_ckpt_path(path), *[np.asarray(l) for l in leaves])


def load_checkpoint(path: str, like: PhysicsState) -> Optional[PhysicsState]:
    path = _ckpt_path(path)
    if not os.path.exists(path):
        return None
    data = np.load(path)
    leaves = [data[k] for k in data.files]
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(
        treedef,
        [
            jnp.asarray(l, ref.dtype)
            for l, ref in zip(leaves, jax.tree.leaves(like))
        ],
    )
