"""Unit tests for bench.py's pure helpers — the driver's per-round
BENCH artifact depends on these emitting a correct normalized headline,
so the arithmetic is pinned without spinning Spark."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _weighted_divisor  # noqa: E402


def test_weighted_divisor_steady_host_equals_plain_mean():
    probes = [0.30, 0.30, 0.30, 0.30, 0.30]
    assert _weighted_divisor(probes, [100.0, 100.0, 100.0]) == 0.30


def test_weighted_divisor_weights_burst_by_pass_wall():
    # a burst bracketing only the LONG pass must dominate the divisor:
    # pass walls 10/10/100, burst probes around the third pass
    probes = [0.30, 0.30, 0.60, 0.60, 0.30]
    got = _weighted_divisor(probes, [10.0, 10.0, 100.0])
    # per-pass estimates: 0.30, 0.45, 0.60 → (10*0.30+10*0.45+100*0.60)/120
    assert abs(got - (3.0 + 4.5 + 60.0) / 120.0) < 1e-12
    # the unweighted mean would read the same burst much lower
    assert got > sum(probes) / len(probes)


def test_weighted_divisor_ignores_unbracketed_end_probe():
    # the end-calibration probe (index past len(walls)) must not shift
    # the weighted value
    base = [0.30, 0.30, 0.30, 0.30]
    assert _weighted_divisor(base + [9.9], [10.0, 10.0, 10.0]) == \
        _weighted_divisor(base + [0.1], [10.0, 10.0, 10.0]) == 0.30


def test_weighted_divisor_falls_back_to_plain_mean():
    assert abs(_weighted_divisor([0.2, 0.4], []) - 0.3) < 1e-12  # no walls
    assert _weighted_divisor([0.5], [10.0, 10.0]) == 0.5  # too few probes
    assert _weighted_divisor([], []) == 0.0
