#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced with a noop-format write so the full result is
computed (count() would let Catalyst prune the compute; collect()
would bill driver-side transfer of wide results to the engine).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_warehouse_opensky_spark.plans import QUERIES
from data_warehouse_opensky_spark.session import get_spark

#: Benched = the ENTIRE catalog (VERDICT r5 #4: a complete per-round
#: perf ledger — an unbenched query is a blind spot where a regression
#: goes unnoticed). No exclusions since r7.
EXCLUDED: set[str] = set()
HEADLINE = [n for n in QUERIES if n not in EXCLUDED]

#: Queries benched on a PURPOSE-BUILT slice instead of the run's
#: sf_dir. AllPairs prefix filtering assumes vocabulary >> corpus
#: (true of real web text); the driver's synthetic documents table has
#: a ~31-word vocabulary, so on it the candidate set degenerates
#: toward all-pairs (~44 s at sf0.1 — a test-data artifact, not a plan
#: property, which is why r1-r6 excluded the query from the bench
#: entirely). The Zipf-vocabulary slice (scripts/gen_scale_slice.py
#: --zipf-only: 5k docs x 50 words from a 50k-word Zipf(1.07) vocab,
#: 100 planted near-dups, deterministic seed) is the query's intended
#: regime at the same sf0.1 row scale: measured 5.6 s, found exactly
#: the 100 planted pairs. Correctness stays gated on the DRIVER's
#: documents table (driver window + tests/test_oracle.py). NOTE the
#: slice is fixed at sf0.1 scale whatever the run's sf — its number
#: only enters history on sf0.1 runs, so the baseline stays clean.
SPECIAL_SF_DIR = {
    "dedup_prefix_filter_jaccard": os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "scale_data", "zipf_docs_sf0.1",
    ),
}


def ensure_special_slices() -> None:
    """(Re)generate purpose-built bench slices if absent OR stale —
    they are gitignored artifacts; generation is deterministic and
    ~1 s. Staleness check (ADVICE r7): the generator writes its
    parameter dict to `zipf_params.json` next to the parquet; if that
    marker is missing or differs from the current
    gen_scale_slice.ZIPF_PARAMS, the slice was built by an older
    recipe and silently benching against it would measure the wrong
    fixture — regenerate."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "gen_scale_slice",
        os.path.join(_REPO, "scripts", "gen_scale_slice.py"),
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    def fresh(d: str) -> bool:
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            return False
        marker = os.path.join(d, "zipf_params.json")
        if not os.path.exists(marker):
            return False
        with open(marker) as f:
            return json.load(f) == gen.ZIPF_PARAMS

    if all(fresh(d) for d in SPECIAL_SF_DIR.values()):
        return
    import subprocess

    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "gen_scale_slice.py"),
            "--zipf-only",
        ],
        check=True,
    )

_REPO = os.path.dirname(os.path.abspath(__file__))

#: Perf-regression gate (VERDICT r5 #6). Calibration: two identical-
#: code full-catalog runs on an idle machine differ by up to ~1.4x /
#: ~0.8 s on individual queries (JVM episodes: GC tails, C2 patches,
#: micro-batch drain timing) — so the gate compares against the
#: BEST-KNOWN time per query (min across all recorded history, which
#: absorbs baseline-side noise) and flags only >1.3x AND >0.5 s
#: (current-side noise above that band is rare; a genuine plan
#: regression shows up well past it).
REGRESSION_RATIO = 1.3
REGRESSION_FLOOR_SEC = 0.5

#: Robust-floor parameters (VERDICT r11 #4: the all-time-min baseline
#: has minimum-statistic bias — one fluke-fast sample latches the
#: floor and the gate re-flags the same healthy query every round
#: until history drowns it; two documented cases in SCALE.md §43/§44).
#: The floor is computed over the last BASELINE_WINDOW history records
#: per query (flukes AGE OUT as rounds accumulate), and with at least
#: BASELINE_DROP_MIN samples in the window the single fastest one is
#: dropped (second-best-of-window — a one-off fluke INSIDE the window
#: cannot set the floor either; a genuine improvement sets it as soon
#: as it reproduces once, i.e. with one-round lag).
BASELINE_WINDOW = 10
BASELINE_DROP_MIN = 4

#: Whole-run alarm (ADVICE r10): per-query flags are shift-normalized,
#: which means a GENUINE suite-wide slowdown (a session-conf change
#: that taxes every query) moves the median itself and escapes the
#: per-query gate. This separate gate trips on the median directly:
#: run_shift above this on a round whose code changed needs human
#: adjudication (hot host? or a conf/plan change that slowed the
#: whole catalog?). 1.15 sits above observed idle-host jitter
#: (≤ ~1.05) and below the r9/r10 hot-host episodes (1.21, 1.35).
RUN_SHIFT_ALARM = 1.15


def robust_floor(samples: list[float]) -> float:
    """The gate's per-query floor over the (chronological) samples of
    the last BASELINE_WINDOW runs: second-best once there are at least
    BASELINE_DROP_MIN samples, plain min below that (see the
    BASELINE_WINDOW comment for why)."""
    window = [v for v in samples[-BASELINE_WINDOW:] if v > 0]
    if not window:
        return 0.0
    if len(window) >= BASELINE_DROP_MIN:
        return sorted(window)[1]
    return min(window)


def compute_floors(records: list[dict]) -> dict[str, float]:
    """Per-query robust floors from chronological history records."""
    samples: dict[str, list[float]] = {}
    for rec in records:
        for k, v in rec.get("queries", {}).items():
            samples.setdefault(k, []).append(float(v))
    return {k: f for k, vs in samples.items() if (f := robust_floor(vs)) > 0}


def load_baseline() -> tuple[str, dict[str, float]]:
    """Best-known per-query times for the regression gate.

    Per-query ROBUST floor (robust_floor) over the chronological
    records of BENCH_HISTORY.jsonl — the FULL record this script
    appends each run (the driver's BENCH_r{N}.json keeps only the
    last 2000 stdout chars, which truncates a 200+-query dict) — plus
    a regex-scrape of the newest BENCH_r*.json tail for queries
    predating the history file (min-merged; such queries have too few
    observations for the robust statistic anyway).
    """
    srcs = []
    records: list[dict] = []
    hist = os.path.join(_REPO, "BENCH_HISTORY.jsonl")
    try:
        lines = [ln for ln in open(hist).read().splitlines() if ln.strip()]
        for ln in lines:
            try:
                records.append(json.loads(ln))
            except ValueError:
                continue
        if lines:
            srcs.append(f"BENCH_HISTORY.jsonl[{len(lines)}]")
    except OSError:
        pass
    best = compute_floors(records)
    import glob

    for f in sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")),
                    reverse=True):
        try:
            tail = json.load(open(f)).get("tail", "")
        except (OSError, ValueError):
            continue
        found = {
            m.group(1): float(m.group(2))
            for m in re.finditer(
                r'"([a-z0-9_]+)": ([0-9]+(?:\.[0-9]+)?)', tail
            )
            if m.group(1) in QUERIES
        }
        if found:
            for k, v in found.items():
                # pre-history queries only: a scraped single sample
                # must not undercut the robust floor computed above
                if v > 0 and k not in best:
                    best[k] = v
            srcs.append(os.path.basename(f))
            break  # newest driver file suffices for pre-history queries
    return "+".join(srcs) or "none", best


def compute_regressions(
    per_query: dict[str, float],
    baseline: dict[str, float],
    shift: float = 1.0,
) -> list[list]:
    """[name, best_known, now_raw, now_norm, ratio_norm] per tripping
    query.

    `shift` is the run's median ratio vs best-known (the whole-run
    hot-host indicator). Flags are computed on SHIFT-NORMALIZED times
    (now / max(shift, 1.0)): a uniformly warm JVM/host moves every
    query by the same factor, and rounds 8-9 each spent part of a
    session adjudicating 8 flags that were all that factor (VERDICT
    r9 #3). Normalizing by the median leaves a genuine single-query
    plan regression fully visible (one query cannot move its own
    median on a 200-query run) while absorbing the uniform component.
    Never normalize UP (shift < 1 on a cold-cache-lucky run would
    inflate times and manufacture flags). Flag rows carry BOTH the
    raw observed time and the normalized one (ADVICE r10: history must
    keep the raw observation; normalization is a lens, not the data).

    Normalization's blind spot — a genuine change that uniformly slows
    the whole suite (e.g. a session-conf change) moves the median
    itself and is invisible here — is covered by the separate
    RUN_SHIFT_ALARM whole-run gate in main()."""
    denom = max(shift, 1.0)
    out = []
    for n, v in per_query.items():
        if n not in baseline or baseline[n] <= 0:
            continue
        v_norm = v / denom
        if (
            v_norm > baseline[n] * REGRESSION_RATIO
            and v_norm - baseline[n] > REGRESSION_FLOOR_SEC
        ):
            out.append([n, baseline[n], round(v, 3), round(v_norm, 3),
                        round(v_norm / baseline[n], 2)])
    out.sort(key=lambda r: -r[-1])
    return out


def covered_by_ledger(ledger: dict, name: str, norm_sec: float) -> bool:
    """True iff `name`'s flag is covered by an adjudication ledger
    entry AND its normalized time is at or under the entry's
    `max_norm_sec` ceiling (entries without a ceiling cover any
    level — discouraged; see bench_adjudications.json)."""
    e = ledger.get(name)
    if e is None:
        return False
    if isinstance(e, dict) and "max_norm_sec" in e:
        return norm_sec <= float(e["max_norm_sec"])
    return True


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    ensure_special_slices()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + each query's codegen/plan paths once on the
    # smallest SF so per-query numbers measure steady-state execution
    # of the query, not first-use initialization (janino compile of the
    # generated code is identical across SFs and cached).
    for name in HEADLINE:
        QUERIES[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    # Queries persist shared subtrees (e.g. dedup signatures) and a
    # bench run never reuses them across queries — drop them so later
    # queries aren't taxed by cache eviction churn.
    spark.catalog.clearCache()

    # Steady-state methodology: best of 3, sampled ROUND-ROBIN (pass 1
    # over every query, then pass 2, then pass 3) — a single local[32]
    # JVM shares its 32 hardware threads with GC and the C2 compiler,
    # so a stop-the-world tail or a slow compile patch can last whole
    # seconds. Consecutive samples of one query all land inside such a
    # patch and the min still lies (observed: join_star_revenue 3.6 s
    # on all 3 consecutive samples, 0.86 s a process later on identical
    # code — the round-2 "regressions" were this, not plan drift).
    # Spreading the samples decorrelates them from any one JVM episode.
    best: dict[str, float] = {name: float("inf") for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name].fn(
                spark, SPECIAL_SF_DIR.get(name, sf_dir)
            ).write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
            spark.catalog.clearCache()

    per_query = {name: round(v, 3) for name, v in best.items()}
    total = sum(per_query.values())
    slowest = sorted(per_query.items(), key=lambda kv: -kv[1])[:5]

    # Regression gate vs the previous recorded run — SAME-SF ONLY, both
    # directions: history only ever holds sf0.1 lines, so comparing a
    # run at any other sf against it is meaningless (sf>0.1 flags
    # everything, sf<0.1 prints a reassuring zero). Skip the gate and
    # say so instead.
    if sf == 0.1:
        base_src, baseline = load_baseline()
        # Whole-run shift indicator: the MEDIAN ratio vs best-known
        # across every baselined query. A median well above 1.0 is a
        # machine episode (uniformly warm JVM/host), not per-query
        # plan drift — so the flags below are computed on
        # shift-NORMALIZED times (see compute_regressions), closing
        # the rounds-8/9 "8 flags, all thermal" adjudication ritual.
        ratios = sorted(
            v / baseline[n]
            for n, v in per_query.items()
            if n in baseline and baseline[n] > 0
        )
        run_shift = round(ratios[len(ratios) // 2], 3) if ratios else None
        regressions = compute_regressions(
            per_query, baseline, shift=run_shift or 1.0
        )
    else:
        base_src, regressions = f"skipped (sf={sf} != 0.1)", []
        run_shift = None

    # Committed adjudication ledger: a flagged query whose flag has
    # been adjudicated (idle-host min-of-3 re-time written to
    # SCALE.md) is recorded in bench_adjudications.json; a recorded
    # artifact whose every flag is covered by the ledger counts as
    # adjudicated even when the driver's recording run can't carry the
    # env pin (VERDICT r11 #1: the r11 artifact shipped
    # flags_adjudicated: false because the env var only existed for
    # in-session runs). Each entry carries `max_norm_sec` — the
    # ceiling the adjudication actually measured — so a FURTHER
    # regression past the adjudicated level re-trips the bit instead
    # of hiding behind the old writeup.
    try:
        with open(os.path.join(_REPO, "bench_adjudications.json")) as f:
            _adj = json.load(f)
    except (OSError, ValueError):
        _adj = {}

    # Shift-normalized headline: the raw total divided by the run's
    # median ratio vs best-known (never below 1.0) — what the total
    # WOULD read on a clean host. Recorded alongside raw, never
    # instead of it (VERDICT r10 #1/#8).
    value_norm = round(total / max(run_shift or 1.0, 1.0), 3)
    # Adjudication state for history consumers (VERDICT r10 #8):
    # trivially true when nothing flagged; a recording run that has
    # had its flags adjudicated (isolated min-of-3 re-times written
    # to SCALE.md) sets SPARK_GRAFT_FLAGS_ADJUDICATED=1.
    flags_adjudicated = (
        len(regressions) == 0
        or os.environ.get("SPARK_GRAFT_FLAGS_ADJUDICATED") == "1"
        or all(covered_by_ledger(_adj, r[0], r[3]) for r in regressions)
    )
    record = {
        # Huge fields FIRST, headline fields LAST: the driver records
        # only the LAST 2000 stdout chars (BENCH_r03's tail cut off
        # the total when the dict led the object), so a tail capture
        # always ends with regressions + totals.
        "queries": per_query,
        "slowest": [[n, v] for n, v in slowest],
        "baseline_src": base_src,
        "regressions": regressions,
        "n_regressions": len(regressions),
        "run_shift": run_shift,
        "run_shift_alarm": bool(
            run_shift is not None and run_shift > RUN_SHIFT_ALARM
        ),
        "flags_adjudicated": flags_adjudicated,
        "excluded": sorted(EXCLUDED),
        "special_slice": sorted(SPECIAL_SF_DIR),
        "metric": "headline_queries_total_time",
        "value": round(total, 3),
        "value_norm": value_norm,
        "unit": "sec",
        "n_queries": len(per_query),
        "sf": sf,
    }
    # Full record survives driver-side truncation via the history file
    # (appended only for the driver's benchmark scale, so dev runs at
    # other SFs never poison the baseline). One O_APPEND write of one
    # pre-serialized buffer under an exclusive flock: two concurrent
    # runs can otherwise interleave partial lines, which load_baseline
    # silently skips — quietly weakening every future baseline.
    if sf == 0.1:
        buf = (json.dumps(record) + "\n").encode()
        fd = os.open(
            os.path.join(_REPO, "BENCH_HISTORY.jsonl"),
            os.O_WRONLY | os.O_CREAT | os.O_APPEND,
            0o644,
        )
        try:
            import fcntl

            fcntl.flock(fd, fcntl.LOCK_EX)
            os.write(fd, buf)
        finally:
            os.close(fd)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(total, 3),
                "value_norm": value_norm,
                "run_shift": run_shift,
                "unit": "sec",
                "n_queries": len(per_query),
                "n_regressions": len(regressions),
                "sf": sf,
            }
        )
    )
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
