"""First-output liveness watchdog.

The remote-attach TPU backend can sit INSIDE backend init or the first
remote compile for minutes with zero output (observed this round: 25+
minutes on a degraded tunnel before the process produced its first
byte), while the reference binary paints instantly
(TerminalRayTracer.c:1235-1370) — so a silent ttrt start is
indistinguishable from a hang. This is the failure-detection subsystem's
liveness half (SURVEY §5): a daemon thread that logs a keep-alive with
the elapsed time and an actionable hint until the first frame lands. It
cannot unblock the stuck call — JAX backend init is not interruptible —
it only makes the wait observable and tells the user their options
(Ctrl-C still aborts; ``--cpu`` forces the local backend).
"""

from __future__ import annotations

import os
import threading
import time

from ttrt.utils.logging import log


def _backend_name() -> str:
    """Best-effort name of the platform JAX will initialize, WITHOUT
    triggering backend initialization (jax.default_backend() would block
    on the very tunnel this watchdog exists to report on)."""
    try:
        import jax

        name = jax.config.read("jax_platforms")
        if name:
            return name
    except Exception:
        pass
    return os.environ.get("JAX_PLATFORMS", "") or "default"


_active = None  # innermost entered watchdog, for first_output()


def first_output() -> None:
    """Signal that the program produced its first user-visible output.

    Cancels the active StartupWatchdog, if any (no-op otherwise, so
    library callers that never arm a watchdog pay nothing). The app
    arms ONE watchdog at main() entry — before the first jnp array
    triggers backend init, which is where a dead tunnel actually
    blocks — and every output loop signals here."""
    a = _active
    if a is not None:
        a.done()


class StartupWatchdog:
    """Context manager logging keep-alives until ``done()`` is called.

    >>> with StartupWatchdog("first frame") as wd:
    ...     buf = first_frame()   # may block minutes in remote compile
    ...     wd.done()             # idempotent, ~free; silence from here
    """

    def __init__(self, what: str = "first frame",
                 interval: float = 30.0, hint: str | None = None):
        self.what = what
        self.interval = interval
        self.hint = (
            hint
            if hint is not None
            else (
                f"backend={_backend_name()!r}; first remote compile can "
                f"take minutes, a dead tunnel forever — Ctrl-C aborts, "
                f"--cpu forces the local backend"
            )
        )
        self._done = threading.Event()
        self._t0 = None
        self._thread = None

    def __enter__(self) -> "StartupWatchdog":
        global _active
        self._outer = _active
        _active = self
        self._t0 = time.monotonic()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def done(self) -> None:
        self._done.set()

    def __exit__(self, *exc) -> None:
        global _active
        self.done()
        if _active is self:
            _active = self._outer

    def _run(self) -> None:
        while not self._done.wait(self.interval):
            log(
                f"still waiting for {self.what} after "
                f"{time.monotonic() - self._t0:.0f}s ({self.hint})",
                level="WARN",
            )
