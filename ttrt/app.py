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
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.config import RenderConfig
from ttrt import assets
from ttrt.frames import orbit_camera_frame
from ttrt.render.integrator import render_frame
from ttrt.scene import Scene, demo_scene
from ttrt.term.display import KeyboardInput, SigintFlag, TerminalDisplay
from ttrt.term.encoder import encode_ansi_frame
from ttrt.utils.logging import log

CAMERA_MOVE_SPEED = 0.1  # meters per keypress (reference stub's constant)


def build_frame_step(scene: Scene, cfg: RenderConfig):
    """jit-compile t -> ANSI byte buffer. ``cam_offset`` is a world-frame
    camera translation driven by arrow keys (extension; reference stub at
    TerminalRayTracer.c:1196-1215)."""

    @jax.jit
    def frame_step(t, cam_offset):
        frame = orbit_camera_frame(t, cfg.dtype)
        frame = frame._replace(origin=frame.origin + cam_offset)
        s = scene.with_camera_frame(frame)
        fb, _ = render_frame(s, cfg)
        return encode_ansi_frame(fb)

    return frame_step


def run_animation(cfg: RenderConfig, skybox_name: str = "colors",
                  max_frames: int | None = None,
                  interactive: bool = True) -> float:
    """The reference's infinite frame loop (TerminalRayTracer.c:1315-1366):
    render, draw, sleep off the frame budget, print fps. Returns the last
    measured fps."""
    skybox = assets.load_skybox(skybox_name, cfg.dtype)
    scene = demo_scene(skybox, cfg.width, cfg.height, cfg.dtype)
    frame_step = build_frame_step(scene, cfg)

    cam_offset = np.zeros(3, np.float64)
    fps = 0.0
    n = 0
    start = time.monotonic()
    with SigintFlag() as sig, TerminalDisplay() as disp, KeyboardInput() as keys:
        while not sig.received and (max_frames is None or n < max_frames):
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
            buf = frame_step(
                jnp.asarray(t, cfg.dtype), jnp.asarray(cam_offset, cfg.dtype)
            )
            disp.write_frame(np.asarray(buf))

            # frame pacing (TerminalRayTracer.c:1350-1355)
            elapsed = time.monotonic() - t0
            budget = cfg.frame_duration
            if budget > elapsed:
                time.sleep(budget - elapsed)
            fps = 1.0 / max(time.monotonic() - t0, 1e-9)
            disp.write_fps(fps)
            n += 1
    return fps


def render_still(cfg: RenderConfig, skybox_name: str, t: float,
                 out_path: str) -> None:
    """High-res still tier (BASELINE config 2): render one frame at time t
    and write a PPM."""
    from ttrt.term.encoder import encode_rgb_frame

    skybox = assets.load_skybox(skybox_name, cfg.dtype)
    scene = demo_scene(skybox, cfg.width, cfg.height, cfg.dtype)

    # one jit over the WHOLE pipeline (camera pose -> render -> quantize):
    # eager device ops are pathologically slow under remote-compile backends.
    @jax.jit
    def still(s: Scene, tt):
        frame = jax.tree.map(
            lambda a: a.astype(cfg.dtype), orbit_camera_frame(tt, cfg.dtype)
        )
        fb, _ = render_frame(s.with_camera_frame(frame), cfg)
        return encode_rgb_frame(fb)

    rgb = np.asarray(still(scene, jnp.asarray(t, cfg.dtype)))
    assets.write_ppm(out_path, rgb)
    log(f"wrote {out_path} ({cfg.width}x{cfg.height})")


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
    p.add_argument("--frames", type=int, default=None,
                   help="stop after N frames (default: run until SIGINT/q)")
    p.add_argument("--still", metavar="OUT.ppm", default=None,
                   help="render a single still to a PPM instead of animating")
    p.add_argument("--time", type=float, default=0.0,
                   help="scene time for --still")
    p.add_argument("--f64", action="store_true",
                   help="float64 compute (parity/CPU; slow on TPU)")
    p.add_argument("--no-input", action="store_true",
                   help="disable keyboard camera controls")
    args = p.parse_args(argv)

    if args.spp < 1 or args.width < 1 or args.height < 1 or args.bounces < 1:
        p.error("--width/--height/--spp/--bounces must be >= 1")
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    cfg = RenderConfig(
        width=args.width, height=args.height, rays_per_pixel=args.spp,
        bounce_limit=args.bounces, frame_rate=args.fps, dtype=dtype,
        skybox_bilinear=args.bilinear,
    )
    try:
        if args.still:
            render_still(cfg, args.skybox, args.time, args.still)
            return 0
        run_animation(cfg, args.skybox, args.frames,
                      interactive=not args.no_input)
    except assets.AssetError as e:
        print(f"ttrt: error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
