#!/usr/bin/env python
"""Generate replica-disjoint scale-up slices of the hot fact table.

The driver ships sf{0.001,0.01,0.1}; the 100 TB story needs a measured
wall-time-vs-sf CURVE, not just prose (VERDICT r5 stretch #7). This
script builds sf0.3 / sf1 lineitem slices by replicating the sf0.1
fact k times with per-replica key offsets:

- `l_orderkey += r * ORDER_SPAN` — baskets stay intact, so per-order
  group sizes (the wedge-explosion budget) are unchanged;
- `l_partkey += r * PART_SPAN`  — each replica's co-purchase graph is
  a DISJOINT ISOMORPHIC COPY of the sf0.1 graph, so per-node degree
  distributions (the peeling/LPA/BFS work profile) are preserved
  while |V|, |E|, and shuffle volume scale linearly.

This is a WEAK-SCALING dataset: it measures how the PLAN's shuffle
volume, aggregate width, and per-round job overhead grow with data
volume at fixed structure — exactly the 100x question — without
inventing new value distributions the driver's generator owns.
Columns other than the two keys are carried verbatim, so flag/price/
qty distributions (weighted-median, pricing-summary inputs) scale as
k identical strata.

Output: /root/repo/scale_data/sf{0.3,1}/ — lineitem replicated,
every other table copied from sf0.1 verbatim (dims; unused by the
curve queries). Directory is gitignored (generated artifact).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scale_data")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
#: slice name -> replication factor over sf0.1
SLICES = {"sf0.3": 3, "sf1": 10}


def _replicate(table: str, key_cols: list[str], k: int, dst: str) -> int:
    """k disjoint isomorphic copies: each key column offsets by its own
    span per replica; all other columns (values, timestamps, text)
    carry verbatim, so per-key series/baskets/degree profiles are
    exactly preserved while volume scales linearly."""
    t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
    cols = {c: t.column(c) for c in key_cols}
    spans = {c: pc.max(cols[c]).as_py() + 1 for c in key_cols}
    reps = []
    for r in range(k):
        rep = t
        if r:
            for c in key_cols:
                rep = rep.set_column(
                    rep.schema.get_field_index(c), c,
                    pc.add(cols[c], r * spans[c]))
        reps.append(rep)
    out = pa.concat_tables(reps)
    pq.write_table(out, os.path.join(dst, f"{table}.parquet"))
    return out.num_rows


#: table -> key columns offset per replica (disjoint-copy invariant)
REPLICATED = {
    "lineitem": ["l_orderkey", "l_partkey"],
    # user offset keeps every per-user event series intact (sessions,
    # trailing windows, attribution paths all replicate exactly);
    # event_id offset keeps the uniqueness/tiebreak contract.
    "events": ["event_id", "user_id"],
}


def main() -> None:
    for name, k in SLICES.items():
        dst = os.path.join(DST_ROOT, name)
        os.makedirs(dst, exist_ok=True)
        for tbl in TABLES:
            if tbl in REPLICATED:
                continue
            shutil.copyfile(
                os.path.join(SRC, f"{tbl}.parquet"),
                os.path.join(dst, f"{tbl}.parquet"),
            )
        for tbl, keys in REPLICATED.items():
            n = _replicate(tbl, keys, k, dst)
            print(f"{name}: {tbl} x{k} = {n} rows -> {dst}")


if __name__ == "__main__":
    main()
