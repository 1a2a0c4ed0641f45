"""WindowedThroughput: sec/step from wall time between sync marks."""

import time

from dalm_tpu.train.metrics import WindowedThroughput


def test_windowed_throughput_drops_compile_window():
    t = WindowedThroughput()
    t.mark(0)
    time.sleep(0.2)   # "compile" window: 2 steps, slow
    t.mark(2)
    time.sleep(0.05)  # steady state: 5 steps
    t.mark(7)
    time.sleep(0.05)
    t.mark(12)
    # avg excludes the first (compile) window: 0.1s / 10 steps
    assert t.avg is not None
    assert 0.005 <= t.avg <= 0.05
    assert t.samples_per_sec(10) > 0


def test_windowed_throughput_single_window_used():
    t = WindowedThroughput()
    t.mark(0)
    time.sleep(0.02)
    t.mark(4)
    assert t.avg is not None and t.avg > 0


def test_windowed_throughput_no_steps():
    t = WindowedThroughput()
    t.mark(0)
    t.mark(0)  # no progress → no window
    assert t.avg is None
    assert t.samples_per_sec(8) == 0.0
