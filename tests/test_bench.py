"""bench.py driver-contract tests (stubbed — no device timing here).

The driver runs ``python bench.py`` at round end and records the ONE
JSON stdout line; these tests pin the contract under failure modes
observed on the remote tunnel: dead backend at init, a tier raising
mid-run, and the slope/ray-count estimators' edge cases."""

import io
import json
import contextlib

import numpy as np
import pytest

import bench


def _rays_result():
    return {
        "mrays_per_s": 2000.0,
        "mrays_per_s_runs": [1900.0, 2000.0, 2100.0],
        "mrays_per_s_xla": 500.0,
        "rays_per_frame": 123,
        "frame_ms": 2.0,
        "frame_ms_xla": 8.0,
        "compile_s": 10.0,
    }


def _stream_result():
    return {
        "fps_device": 3000.0,
        "fps_sync": 25.0,
        "fps_pipelined": 70.0,
        "fps_batched": 400.0,
        "stream_batch": 8,
    }


@pytest.fixture
def stubbed(monkeypatch):
    monkeypatch.setattr(bench, "_init_backend",
                        lambda: ("TestDevice(0)", None))
    monkeypatch.setattr(bench, "bench_rays", _rays_result)
    monkeypatch.setattr(bench, "bench_streaming", _stream_result)
    for name in ("bench_textured", "bench_many_object", "bench_physics",
                 "bench_pathtrace"):
        monkeypatch.setattr(bench, name, dict)


def _run_main():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, "bench must print exactly ONE stdout line"
    return rc, json.loads(lines[0])


class TestMainContract:
    def test_happy_path_json_shape(self, stubbed):
        rc, out = _run_main()
        assert rc == 0
        assert out["value"] == 2000.0
        assert out["unit"] == "Mray/s"
        assert out["vs_baseline"] == 2.0
        assert out["mrays_runs"] == [1900.0, 2000.0, 2100.0]
        assert out["fps_240x64_batched"] == 400.0

    def test_dead_backend_emits_error_json(self, stubbed, monkeypatch):
        monkeypatch.setattr(
            bench, "_init_backend",
            lambda: (None, "backend init timed out after 900s"),
        )
        rc, out = _run_main()
        assert rc == 1
        assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
        assert "timed out" in out["error"]
        # still a well-formed driver line
        for k in ("metric", "value", "unit", "vs_baseline"):
            assert k in out

    def test_headline_tier_failure_is_isolated(self, stubbed, monkeypatch):
        def bench_rays():
            raise RuntimeError("tunnel reset")

        monkeypatch.setattr(bench, "bench_rays", bench_rays)
        rc, out = _run_main()
        assert rc == 0
        assert out["value"] == 0.0
        assert "tunnel reset" in out["bench_rays_error"]
        # the other tiers still report
        assert out["fps_240x64_batched"] == 400.0

    def test_extra_tier_failure_is_isolated(self, stubbed, monkeypatch):
        def bench_many_object():
            raise RuntimeError("compile blew up")

        monkeypatch.setattr(bench, "bench_many_object", bench_many_object)
        rc, out = _run_main()
        assert rc == 0
        assert out["value"] == 2000.0
        assert "compile blew up" in out["bench_many_object_error"]


class TestTimeSeries:
    def test_window_shifts_stay_fresh_and_bounded(self):
        # every (shift_id, k) must land on a DISTINCT f32 device value —
        # a collision replays the backend result cache and min-of-reps
        # would keep the fake-fast rep. Worst published tier params:
        # base=500, step=1/60 (f32 ulp there is ~2x the 0.003-step floor)
        import jax.numpy as jnp

        s = bench.TimeSeries(jnp.float32, base=500.0, step=1.0 / 60.0)
        start = s.reserve(4)
        seen = set()
        for shift in range(1, 33):
            vals = [float(v) for v in s.window(start, 0, 4, shift)]
            assert not (set(vals) & seen), f"cache replay at shift {shift}"
            seen.update(vals)
        # reserved headroom: no shifted value may alias the next take()
        nxt = float(s.take(1)[0])
        assert all(v < nxt for v in seen)


class _StubSeries:
    """TimeSeries stand-in for estimator tests (no device values)."""

    def take(self, n):
        return list(range(n))

    def reserve(self, n):
        return 0

    def window(self, start, lo, n, shift_id):
        return list(range(n))


class TestEstimators:
    def test_mean_rays_averages_over_batch(self):
        outs = [(None, np.int64(4)), (None, np.int64(6)),
                (None, np.int64(8))]
        assert bench._mean_rays(outs) == 6

    def test_throughput_discards_nonpositive_slopes(self, monkeypatch):
        # a jittered pair (small slower than big) must be re-measured,
        # not clamped into the recorded spread
        times = iter([
            0.0, 1.0,            # attempt 1 small: 1.0s
            1.0, 1.5,            # attempt 1 big: 0.5s  -> slope < 0, drop
            0.0, 0.1,            # attempt 2 small: 0.1s
            0.0, 0.3,            # attempt 2 big: 0.3s  -> slope > 0, keep
        ])
        monkeypatch.setattr(bench.time, "perf_counter", lambda: next(times))
        monkeypatch.setattr(
            bench, "_run_batch", lambda fn, scene, batch: [(None, 1)]
        )

        sec, outs, pers = bench._throughput(
            None, None, _StubSeries(), n_small=1, n_big=3, repeats=1,
            phase_reps=1,
        )
        assert pers == [pytest.approx(0.1)]
        assert sec == pytest.approx(0.1)

    def test_phase_time_is_min_over_reps(self, monkeypatch):
        # a one-sided tunnel stall (~30-60 ms hiccup) in the small phase
        # shrinks the slope delta and INFLATES the rate (an impossible
        # 40.5 Gray/s run was recorded this way); min-of-reps keeps the
        # stall-free timing of the same (shift-perturbed) window
        times = iter([
            0.0, 1.0,            # small rep 1: stalled (1.0s)
            0.0, 0.1,            # small rep 2: clean    -> min 0.1
            0.0, 0.35,           # big rep 1: 0.35
            0.0, 0.3,            # big rep 2: 0.3        -> min 0.3
        ])
        monkeypatch.setattr(bench.time, "perf_counter", lambda: next(times))
        monkeypatch.setattr(
            bench, "_run_batch", lambda fn, scene, batch: [(None, 1)]
        )

        sec, outs, pers = bench._throughput(
            None, None, _StubSeries(), n_small=1, n_big=3, repeats=1,
            phase_reps=2,
        )
        assert sec == pytest.approx((0.3 - 0.1) / 2)

    def test_impossible_fast_slope_is_discarded(self, monkeypatch):
        # a slope 3x below the run-pack median is a stall artifact, not
        # a chip that got 3x faster between repeats of the same program
        times = iter([
            0.0, 0.1, 0.0, 0.3,      # slope 0.1
            0.0, 0.1, 0.0, 0.32,     # slope 0.11
            0.0, 0.1, 0.0, 0.102,    # slope 0.001 -> stall artifact
        ])
        monkeypatch.setattr(bench.time, "perf_counter", lambda: next(times))
        monkeypatch.setattr(
            bench, "_run_batch", lambda fn, scene, batch: [(None, 1)]
        )

        sec, outs, pers = bench._throughput(
            None, None, _StubSeries(), n_small=1, n_big=3, repeats=3,
            phase_reps=1,
        )
        assert len(pers) == 2
        assert pers == [pytest.approx(0.1), pytest.approx(0.11)]

    def test_throughput_keep_outs_pairs_runs_with_outputs(self, monkeypatch):
        # ADVICE r3: each recorded slope must come with ITS repeat's
        # outputs so *_runs rates use per-run trace-count numerators
        times = iter([0.0, 0.1, 0.0, 0.3, 0.0, 0.1, 0.0, 0.5])
        monkeypatch.setattr(bench.time, "perf_counter", lambda: next(times))
        batches = iter([[("w", 1)], [("s1", 10)], [("b1", 20)],
                        [("s2", 30)], [("b2", 40)]])
        monkeypatch.setattr(
            bench, "_run_batch", lambda fn, scene, batch: next(batches)
        )

        sec, outs_list, pers = bench._throughput(
            None, None, _StubSeries(), n_small=1, n_big=3, repeats=2,
            keep_outs=True, phase_reps=1,
        )
        assert len(outs_list) == len(pers) == 2
        assert outs_list[0] == [("b1", 20)]
        assert outs_list[1] == [("b2", 40)]
        assert bench._mean_rays(outs_list[0]) == 20


    def test_throughput_raises_when_no_positive_slope(self, monkeypatch):
        # a fake 1e-9 slope would post a ~1e15 Mray/s headline; with no
        # information the tier must FAIL into run_tier's error isolation
        monkeypatch.setattr(bench.time, "perf_counter",
                            lambda: next(iter_times))
        monkeypatch.setattr(
            bench, "_run_batch", lambda fn, scene, batch: [(None, 1)]
        )
        iter_times = iter([0.0, 1.0, 1.0, 1.5] * 10)

        with pytest.raises(RuntimeError, match="no positive slope"):
            bench._throughput(None, None, _StubSeries(), n_small=1,
                              n_big=3, repeats=1, phase_reps=1)
