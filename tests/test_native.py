"""Native C runtime vs the Python/NumPy oracle encoders."""

import os
import time

import numpy as np
import pytest

from ttrt import native
from ttrt.term.encoder import ansi_buffer_size, encode_ansi_host

pytestmark = pytest.mark.skipif(
    not native.available, reason="no C compiler / native lib"
)


def test_native_encoder_matches_host_oracle(rng):
    H, W = 13, 29
    rgb = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    enc = native.NativeAnsiEncoder(H, W)
    out = enc.encode(rgb)
    assert out.tobytes() == encode_ansi_host(rgb)


def test_native_size_matches():
    assert native.NativeAnsiEncoder(7, 5).size == ansi_buffer_size(5, 7)


def test_template_reuse_across_frames(rng):
    enc = native.NativeAnsiEncoder(4, 6)
    for _ in range(3):
        rgb = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
        assert enc.encode(rgb).tobytes() == encode_ansi_host(rgb)


def test_write_full(tmp_path):
    enc = native.NativeAnsiEncoder(2, 2)
    rgb = np.zeros((2, 2, 3), np.uint8)
    enc.encode(rgb)
    p = tmp_path / "frame.bin"
    fd = os.open(p, os.O_WRONLY | os.O_CREAT)
    try:
        enc.write(fd)
    finally:
        os.close(fd)
    assert p.read_bytes() == encode_ansi_host(rgb)


def test_sleep_until_is_absolute():
    t0 = native.monotonic()
    native.sleep_until(t0 + 0.05)
    assert native.monotonic() - t0 >= 0.045


def test_sleep_until_past_deadline_returns_immediately():
    t0 = native.monotonic()
    native.sleep_until(t0 - 1.0)
    assert native.monotonic() - t0 < 0.05
