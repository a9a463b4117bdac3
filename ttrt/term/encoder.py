"""ANSI truecolor frame encoding — ON DEVICE.

The reference's fast output path (TerminalRayTracer.c:1101-1172) pre-renders
one big ANSI escape template on the host and, each frame, patches the 3x3
decimal digit fields in place with pointer arithmetic, then emits a single
fwrite. We move the entire encode onto the TPU:

  float framebuffer -> *255 int truncation -> per-channel decimal digits
  (an integer div/mod, TerminalRayTracer.c:1133-1139) -> scatter into a
  constant byte template -> ONE uint8 buffer.

Everything is elementwise over H*W lanes, so XLA fuses quantize + digits +
template assembly into the tail of the render computation; the host does a
single device->host copy and one write(2). This keeps the host out of the
per-pixel loop entirely — the TPU-native analog of the reference's
"one fwrite" optimization.

Byte layout per pixel (pixel_str, TerminalRayTracer.c:1103):
    \\033[48;2;RRR;GGG;BBBm  \\033[0m   (25 bytes)
offsets: R digits at 7..9, G at 11..13, B at 15..17.
Each row of W pixels ends with \\n; the frame starts with the cursor-home
prefix \\033[0;0H (reset_str, TerminalRayTracer.c:1102). (The reference's
fwrite also emits its buffer's trailing NUL + 2 slack bytes — an artifact
of `sizeof`, not reproduced.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ttrt.vec import Vec3

RESET_STR = b"\033[0;0H"
PIXEL_TEMPLATE = np.frombuffer(b"\033[48;2;000;000;000m  \033[0m", np.uint8)
PIXEL_BYTES = PIXEL_TEMPLATE.size  # 25
_R_OFF, _G_OFF, _B_OFF = 7, 11, 15
_ZERO = ord("0")


def quantize_channel(c: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] -> int32 0..255 via C's (int)(x*255) truncation
    (TerminalRayTracer.c:1157-1163)."""
    return (c * 255.0).astype(jnp.int32)


def _digits(v: jnp.ndarray):
    """byte_to_digits (TerminalRayTracer.c:1133-1139): 3 base-10 ASCII
    digits with leading zeros."""
    d0 = v // 100 + _ZERO
    d1 = (v // 10) % 10 + _ZERO
    d2 = v % 10 + _ZERO
    return d0.astype(jnp.uint8), d1.astype(jnp.uint8), d2.astype(jnp.uint8)


def encode_ansi_frame(fb: Vec3) -> jnp.ndarray:
    """(H, W) float framebuffer -> flat uint8 ANSI byte buffer (device).

    Output length = len(RESET_STR) + H * (W * PIXEL_BYTES + 1).
    """
    H, W = fb.x.shape
    r, g, b = (quantize_channel(c).reshape(-1) for c in (fb.x, fb.y, fb.z))

    body = jnp.broadcast_to(
        jnp.asarray(PIXEL_TEMPLATE), (H * W, PIXEL_BYTES)
    )
    cols = {}
    for off, v in ((_R_OFF, r), (_G_OFF, g), (_B_OFF, b)):
        d0, d1, d2 = _digits(v)
        cols[off], cols[off + 1], cols[off + 2] = d0, d1, d2
    # one fused scatter per digit column
    body = functools.reduce(
        lambda acc, kv: acc.at[:, kv[0]].set(kv[1]), cols.items(), body
    )
    rows = body.reshape(H, W * PIXEL_BYTES)
    newlines = jnp.full((H, 1), ord("\n"), jnp.uint8)
    rows = jnp.concatenate([rows, newlines], axis=1)
    prefix = jnp.asarray(np.frombuffer(RESET_STR, np.uint8))
    return jnp.concatenate([prefix, rows.reshape(-1)])


def encode_rgb_frame(fb: Vec3) -> jnp.ndarray:
    """(H, W) float framebuffer -> (H, W, 3) uint8 on device — the compact
    wire format when the ANSI expansion happens on host (native encoder or
    image export)."""
    return jnp.stack(
        [quantize_channel(c).astype(jnp.uint8) for c in (fb.x, fb.y, fb.z)],
        axis=-1,
    )


def ansi_buffer_size(width: int, height: int) -> int:
    return len(RESET_STR) + height * (width * PIXEL_BYTES + 1)


def encode_ansi_host(rgb: np.ndarray) -> bytes:
    """Host/NumPy reference encoder: (H, W, 3) uint8 -> ANSI bytes. The
    correctness oracle for the device encoder and the fallback when frames
    arrive as compact RGB."""
    H, W, _ = rgb.shape
    body = np.broadcast_to(PIXEL_TEMPLATE, (H * W, PIXEL_BYTES)).copy()
    flat = rgb.reshape(-1, 3).astype(np.int32)
    for off, v in ((_R_OFF, flat[:, 0]), (_G_OFF, flat[:, 1]), (_B_OFF, flat[:, 2])):
        body[:, off] = v // 100 + _ZERO
        body[:, off + 1] = (v // 10) % 10 + _ZERO
        body[:, off + 2] = v % 10 + _ZERO
    rows = body.reshape(H, W * PIXEL_BYTES)
    out = np.concatenate(
        [rows, np.full((H, 1), ord("\n"), np.uint8)], axis=1
    )
    return RESET_STR + out.tobytes()
