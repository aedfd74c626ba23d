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


# ---- robust floor (VERDICT r11 #4: retire fluke minimums) -----------------


def test_adjudicated_oneoff_fluke_no_longer_sets_floor():
    # 9 clean samples at ~2.0 s and ONE fluke 0.9 s inside the window:
    # under the old all-time-min rule the fluke latches the baseline
    # and a healthy 2.2 s run flags forever; the robust floor drops
    # the single best, so the floor is a clean-band sample.
    records = [{"queries": {"q": 2.0 + 0.01 * i}} for i in range(9)]
    records.insert(4, {"queries": {"q": 0.9}})
    floors = bench.compute_floors(records)
    assert floors["q"] >= 2.0
    assert bench.compute_regressions({"q": 2.2}, floors, shift=1.0) == []


def test_fluke_ages_out_of_window():
    # a fluke OLDER than the last BASELINE_WINDOW runs is invisible
    records = [{"queries": {"q": 0.5}}] + [
        {"queries": {"q": 2.0}} for _ in range(bench.BASELINE_WINDOW)
    ]
    assert bench.compute_floors(records)["q"] == 2.0


def test_genuine_improvement_sets_floor_once_reproduced():
    # a real speedup appears in consecutive runs; after the second
    # observation the floor follows it (one-round lag by design)
    records = [{"queries": {"q": 2.0}} for _ in range(8)]
    records += [{"queries": {"q": 1.0}}, {"queries": {"q": 1.02}}]
    assert bench.compute_floors(records)["q"] <= 1.02


def test_sparse_history_uses_plain_min():
    # under BASELINE_DROP_MIN samples there is nothing to drop
    records = [{"queries": {"q": 1.5}}, {"queries": {"q": 1.2}}]
    assert bench.compute_floors(records)["q"] == 1.2


def test_genuine_regression_still_flags_on_robust_floor():
    # the robust floor must not blunt the gate: steady 1.0 s history,
    # current run 2.0 s -> flagged
    records = [{"queries": {"q": 1.0}} for _ in range(10)]
    floors = bench.compute_floors(records)
    rows = bench.compute_regressions({"q": 2.0}, floors, shift=1.0)
    assert [r[0] for r in rows] == ["q"]


def test_adjudication_ledger_ceiling():
    # a ledger entry covers a flag only UP TO its measured ceiling; a
    # further regression past it re-trips flags_adjudicated
    ledger = {"q": {"note": "host episode", "max_norm_sec": 2.5}}
    assert bench.covered_by_ledger(ledger, "q", 2.4)
    assert not bench.covered_by_ledger(ledger, "q", 2.6)
    assert not bench.covered_by_ledger(ledger, "other", 0.1)


def test_committed_ledger_parses_and_has_ceilings():
    import json
    import os

    with open(os.path.join(_REPO, "bench_adjudications.json")) as f:
        ledger = json.load(f)
    entries = {k: v for k, v in ledger.items() if not k.startswith("_")}
    assert entries, "ledger must not be empty"
    for name, e in entries.items():
        assert isinstance(e, dict) and "max_norm_sec" in e, name
        assert e["max_norm_sec"] > 0
