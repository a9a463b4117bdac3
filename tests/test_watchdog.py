"""StartupWatchdog: the first-output liveness keep-alive (the
failure-detection analog for a silent backend init / remote compile —
observed 25+ min of silence on a degraded tunnel)."""

import time

from ttrt.utils.watchdog import StartupWatchdog, _backend_name


class TestStartupWatchdog:
    def test_logs_keepalive_while_blocked(self, capfd):
        with StartupWatchdog("test output", interval=0.05, hint="h"):
            time.sleep(0.35)
        err = capfd.readouterr().err
        assert "still waiting for test output" in err
        assert "(h)" in err
        assert "WARN" in err
        # elapsed time is reported
        assert "after" in err

    def test_done_silences(self, capfd):
        with StartupWatchdog("test output", interval=0.05, hint="h") as wd:
            wd.done()
            time.sleep(0.3)
        assert "still waiting" not in capfd.readouterr().err

    def test_done_is_idempotent(self):
        with StartupWatchdog(interval=0.05, hint="h") as wd:
            wd.done()
            wd.done()
        wd.done()  # after exit too

    def test_fast_path_logs_nothing(self, capfd):
        with StartupWatchdog(interval=5.0, hint="h") as wd:
            wd.done()
        assert capfd.readouterr().err == ""

    def test_backend_name_does_not_initialize_backend(self):
        # must be answerable without touching the (possibly dead) tunnel;
        # under the test conftest the in-process platform is 'cpu'
        name = _backend_name()
        assert isinstance(name, str) and name
        assert name == "cpu"
