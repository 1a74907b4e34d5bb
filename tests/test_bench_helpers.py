"""Unit tests for bench.py's pure helpers — the driver's per-round
BENCH artifact carries the quiet-gate verdict the BASELINE.md floor
contract depends on, so the gate arithmetic is pinned without spinning
Spark. (The r9/r10 _weighted_divisor normalization was retired in r11:
the divisor study found neither probe form predicts core36 inside the
quiet regime — SCALE_TREND.md "r11 divisor decision".)"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import LOAD1_QUIET, SPAWN_QUIET, _quiet_gate  # noqa: E402


def test_quiet_gate_passes_on_verified_quiet_conditions():
    # the r10 quiet2 record's shape: pre-run load 0.16, spawns 0.55-0.66
    g = _quiet_gate(0.16, [0.655, 0.561, 0.583, 0.591, 0.551])
    assert g["pass"] is True
    assert g["load1_prerun"] == 0.16
    assert g["spawn_max"] == 0.655


def test_quiet_gate_fails_on_prerun_neighbor_load():
    # loadavg is host-wide: a 25-34 neighbor episode must fail the gate
    # even when every spawn probe happens to land quiet
    g = _quiet_gate(25.0, [0.60, 0.62, 0.64])
    assert g["pass"] is False


def test_quiet_gate_fails_on_any_loud_spawn_boundary():
    # ONE loud boundary disqualifies the record (the r10 'a' record's
    # mid-run burst shape) — max, not mean
    g = _quiet_gate(0.5, [0.60, 0.95, 0.62, 0.61])
    assert g["pass"] is False
    assert g["spawn_max"] == 0.95


def test_quiet_gate_boundary_values():
    assert _quiet_gate(LOAD1_QUIET, [0.60])["pass"] is False  # strict <
    assert _quiet_gate(1.99, [SPAWN_QUIET])["pass"] is True   # inclusive <=
    assert _quiet_gate(1.99, [SPAWN_QUIET + 0.001])["pass"] is False


def test_quiet_gate_missing_readings_never_pass():
    # a record without the gate readings cannot claim quiet conditions
    assert _quiet_gate(None, [0.60])["pass"] is False
    assert _quiet_gate(0.2, [])["pass"] is False
    assert _quiet_gate(0.2, [])["spawn_max"] is None
