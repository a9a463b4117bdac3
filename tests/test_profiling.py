"""Stage timers + frame meter."""

import time

from ttrt.utils.profiling import FrameMeter, StageTimers


def test_stage_timers_accumulate():
    t = StageTimers()
    for _ in range(5):
        with t.stage("render"):
            time.sleep(0.002)
    with t.stage("write"):
        pass
    s = t.summary()
    assert s["render"]["n"] == 5
    assert s["render"]["mean_ms"] >= 1.5
    assert s["write"]["n"] == 1


def test_frame_meter_ema_and_hud():
    m = FrameMeter(alpha=0.5)
    m.update(0.02, rays=1_000_000)  # 50 fps, 50 Mray/s
    m.update(0.02, rays=1_000_000)
    assert abs(m.fps - 50.0) < 1e-6
    hud = m.hud()
    assert "fps" in hud and "Mray/s" in hud


def test_frame_meter_without_rays():
    m = FrameMeter()
    m.update(0.1)
    assert "fps" in m.hud()
    assert m.mrays is None


def test_count_bits():
    import numpy as np
    import jax.numpy as jnp
    from ttrt.utils import count_bits

    assert count_bits(0) == 0
    assert count_bits(0b1011) == 3
    assert count_bits(0xFFFFFFFF) == 32
    out = np.asarray(count_bits(jnp.asarray([0, 1, 3, 255], jnp.int32)))
    np.testing.assert_array_equal(out, [0, 1, 2, 8])
