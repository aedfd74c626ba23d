"""Pins for bench.py's regression gate (no SparkSession needed).

The gate's contract changed in r11 (ADVICE r10): flag rows must carry
BOTH the raw observed time and the shift-normalized one, and a
whole-run alarm must exist for suite-wide slowdowns that per-query
shift normalization structurally cannot see.
"""

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_flag_row_carries_raw_and_normalized():
    base = {"q1": 1.0, "q2": 2.0}
    # q1 regresses 3x beyond the floor; run is uniformly 1.5x hot
    per = {"q1": 4.5, "q2": 3.0}
    rows = bench.compute_regressions(per, base, shift=1.5)
    assert len(rows) == 1
    name, best, raw, norm, ratio = rows[0]
    assert name == "q1"
    assert best == 1.0
    assert raw == 4.5  # the observation, un-normalized
    assert norm == 3.0  # 4.5 / 1.5
    assert ratio == 3.0


def test_uniform_hot_host_produces_no_flags():
    base = {f"q{i}": 1.0 for i in range(20)}
    per = {f"q{i}": 1.4 for i in range(20)}  # all 1.4x — host episode
    assert bench.compute_regressions(per, base, shift=1.4) == []


def test_shift_never_normalizes_up():
    base = {"q1": 1.0}
    per = {"q1": 1.2}  # below gate raw; shift < 1 must not inflate it
    assert bench.compute_regressions(per, base, shift=0.5) == []


def test_whole_run_alarm_threshold_between_jitter_and_episodes():
    # idle-host jitter observed <= ~1.05; hot episodes 1.21 / 1.35 —
    # the alarm must separate them
    assert 1.05 < bench.RUN_SHIFT_ALARM < 1.21


def test_single_query_regression_survives_normalization():
    # one query cannot move its own median on a wide run
    base = {f"q{i}": 1.0 for i in range(99)}
    per = {f"q{i}": 1.0 for i in range(99)}
    per["q0"] = 5.0
    rows = bench.compute_regressions(per, base, shift=1.0)
    assert [r[0] for r in rows] == ["q0"]
