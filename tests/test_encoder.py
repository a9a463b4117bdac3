"""ANSI encoder tests: byte-exact template, digit patching, device==host
(reference: TerminalRayTracer.c:1101-1172)."""

import jax.numpy as jnp
import numpy as np

from ttrt.term.encoder import (
    PIXEL_BYTES,
    PIXEL_TEMPLATE,
    RESET_STR,
    ansi_buffer_size,
    encode_ansi_frame,
    encode_ansi_host,
    encode_rgb_frame,
    quantize_channel,
)
from ttrt.vec import Vec3


def fb_from_rgb(rgb_float: np.ndarray) -> Vec3:
    a = jnp.asarray(rgb_float, jnp.float64)
    return Vec3(a[..., 0], a[..., 1], a[..., 2])


class TestTemplate:
    def test_pixel_template_layout(self):
        # \033[48;2;000;000;000m  \033[0m == 25 bytes, digits at 7/11/15
        assert PIXEL_BYTES == 25
        t = PIXEL_TEMPLATE.tobytes()
        assert t.startswith(b"\033[48;2;")
        assert t[7:10] == b"000" and t[10:11] == b";"
        assert t[11:14] == b"000" and t[14:15] == b";"
        assert t[15:18] == b"000"
        assert t[18:] == b"m  \033[0m"

    def test_buffer_size_formula(self):
        # reset(6) + H*(W*25 + newline)  (cf. TerminalRayTracer.c:1104)
        assert ansi_buffer_size(480, 280) == 6 + 280 * (480 * 25 + 1)


class TestQuantize:
    def test_truncation_semantics(self):
        # (int)(x*255): truncation toward zero (TerminalRayTracer.c:1157)
        vals = jnp.asarray([0.0, 1.0, 0.999, 0.5, 1.0 / 255.0 * 0.999])
        got = np.asarray(quantize_channel(vals))
        np.testing.assert_array_equal(got, [0, 255, 254, 127, 0])


class TestEncode:
    def test_known_pixel_bytes(self):
        rgb = np.array([[[0.0, 0.5, 1.0]]])
        buf = bytes(np.asarray(encode_ansi_frame(fb_from_rgb(rgb))))
        want = b"\033[0;0H" + b"\033[48;2;000;127;255m  \033[0m" + b"\n"
        assert buf == want

    def test_device_equals_host(self, rng):
        rgb = rng.uniform(0, 1, (7, 11, 3))
        dev = bytes(np.asarray(encode_ansi_frame(fb_from_rgb(rgb))))
        host = encode_ansi_host(
            np.asarray(encode_rgb_frame(fb_from_rgb(rgb)))
        )
        assert dev == host

    def test_row_newlines(self):
        rgb = np.zeros((3, 2, 3))
        buf = bytes(np.asarray(encode_ansi_frame(fb_from_rgb(rgb))))
        assert buf.count(b"\n") == 3
        assert len(buf) == ansi_buffer_size(2, 3)

    def test_all_byte_values_valid_ansi(self, rng):
        rgb = rng.uniform(0, 1, (4, 4, 3))
        buf = bytes(np.asarray(encode_ansi_frame(fb_from_rgb(rgb))))
        import re

        cells = re.findall(
            rb"\x1b\[48;2;(\d{3});(\d{3});(\d{3})m  \x1b\[0m", buf
        )
        assert len(cells) == 16
        q = np.asarray((jnp.asarray(rgb) * 255).astype(jnp.int32)).reshape(-1, 3)
        got = np.array([[int(x) for x in c] for c in cells])
        np.testing.assert_array_equal(got, q)
