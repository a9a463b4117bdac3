"""ctypes bindings for the native host runtime (csrc/ttrt_native.c).

The shared library is compiled on first import with the system C compiler
and cached next to this package; everything degrades gracefully to the
pure-Python implementations in ttrt.term when no compiler is available
(``available`` is False and callers fall back).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, os.pardir, os.pardir, "csrc", "ttrt_native.c")
_LIB_PATH = os.path.join(_HERE, "_ttrt_native.so")

_lib: Optional[ctypes.CDLL] = None
available = False


def _compile() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.isfile(src):
        return None
    if os.path.isfile(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(src):
        return _LIB_PATH
    for cc in ("cc", "gcc", "clang", "g++"):
        tmp = None
        try:
            # build to a temp file then atomically rename (concurrent imports)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
            os.close(fd)
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, _LIB_PATH)
            return _LIB_PATH
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
            continue
    return None


def _load() -> None:
    global _lib, available
    path = _compile()
    if path is None:
        return
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return
    lib.ttrt_ansi_size.restype = ctypes.c_long
    lib.ttrt_ansi_size.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ttrt_init_template.restype = None
    lib.ttrt_init_template.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.ttrt_encode_ansi.restype = None
    lib.ttrt_encode_ansi.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.ttrt_write_full.restype = ctypes.c_int
    lib.ttrt_write_full.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
    ]
    lib.ttrt_monotonic.restype = ctypes.c_double
    lib.ttrt_monotonic.argtypes = []
    lib.ttrt_sleep_until.restype = None
    lib.ttrt_sleep_until.argtypes = [ctypes.c_double]
    _lib = lib
    available = True


try:
    _load()
except Exception:  # the fallback contract: never fail at import time
    _lib, available = None, False


class NativeAnsiEncoder:
    """Template-patching host encoder (reference buffered_draw_screen,
    TerminalRayTracer.c:1101-1172, reimplemented in C for the compact-RGB
    wire path). Owns a persistent template buffer per resolution."""

    def __init__(self, height: int, width: int):
        if not available:
            raise RuntimeError("native runtime not available")
        self.height = height
        self.width = width
        self.size = int(_lib.ttrt_ansi_size(height, width))
        self._buf = np.empty(self.size, np.uint8)
        _lib.ttrt_init_template(
            height, width, self._buf.ctypes.data_as(ctypes.c_char_p)
        )

    def encode(self, rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> ANSI byte buffer (returns an internal buffer;
        valid until the next encode call)."""
        rgb = np.ascontiguousarray(rgb, np.uint8)
        assert rgb.shape == (self.height, self.width, 3), rgb.shape
        _lib.ttrt_encode_ansi(
            rgb.ctypes.data_as(ctypes.c_char_p),
            self.height,
            self.width,
            self._buf.ctypes.data_as(ctypes.c_char_p),
        )
        return self._buf

    def write(self, fd: int) -> None:
        rc = _lib.ttrt_write_full(
            fd, self._buf.ctypes.data_as(ctypes.c_char_p), self.size
        )
        if rc != 0:
            raise OSError("ttrt_write_full failed")


def monotonic() -> float:
    if available:
        return float(_lib.ttrt_monotonic())
    import time

    return time.monotonic()


def sleep_until(deadline: float) -> None:
    """Absolute-deadline sleep on CLOCK_MONOTONIC (drift-free pacing)."""
    if available:
        _lib.ttrt_sleep_until(deadline)
        return
    import time

    delay = deadline - time.monotonic()
    if delay > 0:
        time.sleep(delay)


def write_full(fd: int, buf) -> None:
    if available:
        b = np.ascontiguousarray(np.frombuffer(bytes(buf), np.uint8))
        rc = _lib.ttrt_write_full(
            fd, b.ctypes.data_as(ctypes.c_char_p), b.size
        )
        if rc != 0:
            raise OSError("ttrt_write_full failed")
        return
    os.write(fd, bytes(buf))
