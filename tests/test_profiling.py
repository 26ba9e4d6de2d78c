"""Telemetry phase-stat semantics (utils/profiling.py).

The QUALITY artifacts' compile-vs-steady separation depends on these
definitions: first_sec = first call (carries the jit compile), max_sec
exposes mid-run recompiles, steady_sec_per_call = mean excluding the first
call (absorbs mid-run first-builds), median_sec_per_call = the honest
steady rate (robust to those one-off compiles).
"""
import time

from gflow_tpu.utils.profiling import Telemetry, _median


def test_median_helper():
    assert _median([]) == 0.0
    assert _median([3.0]) == 3.0
    assert _median([1.0, 9.0]) == 5.0
    assert _median([9.0, 1.0, 2.0]) == 2.0
    assert _median([4.0, 1.0, 2.0, 100.0]) == 3.0


def test_phase_stats_separate_compile_from_steady():
    tel = Telemetry()
    # synthetic call profile: one 'compile' call, one mid-run 'recompile',
    # three fast steady calls
    for dt in (0.05, 0.001, 0.04, 0.001, 0.001):
        with tel.phase("stage"):
            time.sleep(dt)
    s = tel.summary()["phases"]["stage"]
    assert s["calls"] == 5
    assert s["first_sec"] >= 0.05
    assert s["max_sec"] >= 0.05
    # steady mean includes the mid-run 0.04 outlier...
    assert s["steady_sec_per_call"] > 0.01
    # ...the median does not
    assert s["median_sec_per_call"] < 0.01
    assert abs(s["sec"] - sum((0.05, 0.001, 0.04, 0.001, 0.001))) < 0.05


def test_gauges_and_frames():
    tel = Telemetry()
    tel.count_frame(450)
    tel.count_frame(450)
    tel.gauge("tile_overflow_last", 0.25)
    s = tel.summary()
    assert s["frames"] == 2
    assert s["tile_overflow_last"] == 0.25
    assert s["opt_steps_per_sec"] >= 0
