#!/usr/bin/env python
"""Record the result-hash pin table (VERDICT r7 #8 — retiring the
re-confirmation treadmill).

Problem: 246 driver-green queries re-rotate through the external
driver's 50-slot window every ~5 rounds purely to re-confirm that
nothing changed. Proposal (see SCALE.md round-8 ledger): pin each
query's RESULT HASH against a fixture version. tests/test_oracle.py
then re-checks every pin locally each round (the hash falls out of
the compare it already runs — zero extra query executions), so a
silent behavior change in ANY of the 246 queries is caught locally
within one pytest run, and driver slots can concentrate on new and
changed plans instead of round-robin re-confirmation.

Hash semantics match the driver's: lowercase column names sorted,
rows order-insensitive, values through the pandas/numpy type-tag
normalization (oracle_harness._norm_cell). The pin table records the
fixture digest (file bytes) so regenerated testdata voids the pins
loudly instead of failing them confusingly.

Usage: python scripts/gen_oracle_pins.py [sf_dir]   (default sf0.001)
Rerun whenever a query's result INTENTIONALLY changes (new query,
fixture bump, semantic fix) and commit the updated JSON; the pin diff
in review is itself the change record.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from data_warehouse_opensky_spark.session import get_spark  # noqa: E402
from oracle_harness import fixture_digest, result_hash  # noqa: E402

PIN_PATH = Path(__file__).resolve().parent.parent / "tests" / "oracle_pins.json"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from data_warehouse_opensky_spark.plans import QUERIES

    spark = get_spark("gen-pins")
    spark.sparkContext.setLogLevel("ERROR")
    pins: dict[str, dict] = {}
    t0 = time.time()
    for name, q in QUERIES.items():
        sdf = q.fn(spark, sf_dir)
        pdf = sdf.toPandas()
        cols = [str(c).lower() for c in pdf.columns]
        rows = list(pdf.itertuples(index=False, name=None))
        pins[name] = {
            "rows": len(rows),
            "hash": result_hash(cols, rows),
            "oracle_gated": q.oracle is not None,
        }
        spark.catalog.clearCache()
    out = {
        "_meta": {
            "sf_dir": sf_dir,
            "fixture_digest": fixture_digest(sf_dir),
            "n_queries": len(pins),
        },
        "pins": dict(sorted(pins.items())),
    }
    PIN_PATH.write_text(json.dumps(out, indent=1, sort_keys=False) + "\n")
    print(
        f"wrote {len(pins)} pins to {os.path.relpath(PIN_PATH)} "
        f"in {time.time() - t0:.0f}s"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
