"""Persistent XLA compilation cache across process restarts.

The reference starts instantly (TerminalRayTracer.c:1235-1370 — compiled
ahead of time); ttrt's cold start is dominated by the remote TPU compile
(minutes for the full-depth kernels on the axon tunnel). JAX's
disk-backed compilation cache replays a previously compiled executable
for an identical (program, compile options, backend) key, which turns
the SECOND process's cold start into a disk read + executable upload.

Enabled by default from the app and bench entry points; set
``TTRT_COMPILE_CACHE=0`` to disable or ``TTRT_COMPILE_CACHE=<dir>`` to
relocate (default ``~/.cache/ttrt-jax``). Whether the cache can work at
all depends on the backend: PJRT plugins that compile REMOTELY and never
hand the client a serializable executable defeat it — measure, don't
assume (VERDICT r3 item 5); README's TTFF table records the result.
"""

from __future__ import annotations

import os

from ttrt.utils.logging import log

_DEFAULT_DIR = "~/.cache/ttrt-jax"


def enable_compile_cache(quiet: bool = True) -> str | None:
    """Point JAX's persistent compilation cache at a disk directory.
    Returns the directory in use, or None when disabled. Safe to call
    before or after backend init (config flags are read at compile
    time); errors are non-fatal (a bench must not die over a cache)."""
    env = os.environ.get("TTRT_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = os.path.expanduser(env if env not in ("", "1") else _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took real compile time; the default
        # (1 s floor + size floor) skips exactly the small programs
        # whose REMOTE compile round trips still cost seconds here
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # knob absent on older jax
        if not quiet:
            log(f"compile cache: {path}")
        return path
    except Exception as e:  # non-fatal by design
        if not quiet:
            log(f"compile cache unavailable: {e!r}")
        return None
