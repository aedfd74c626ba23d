"""foreachBatch upsert sink: latest-wins keyed MERGE into a parquet
target, one transaction per micro-batch.

The reference's staging load is an append plus a keyed ON CONFLICT
update on its ledger (load_warehouse.py:110-125); in Structured
Streaming the idiomatic shape for any merge/upsert sink is
`writeStream.foreachBatch` — the batch DataFrame API (joins, windows,
arbitrary writers) applied to each micro-batch, with the streaming
checkpoint guaranteeing each batch is applied exactly once per
batch_id.

Scale: each micro-batch merge is
  target ∪ batch → row_number over (key ORDER BY version desc) → keep 1
i.e. one shuffle on the key per micro-batch, sized by |target ∪ batch|.
At 100 TB you partition the target (e.g. by key range or date) and
rewrite only the partitions the batch touches — the merge plan is the
same, the rewrite set shrinks. The swap is atomic at the directory
level (write to `_staging_v{batch_id}`, then rename over `current`),
so readers never observe a half-written target — the parquet twin of
the reference's per-file transaction (T1.23).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: Subdirectory of the sink root holding the current merged snapshot.
CURRENT = "current"


def _merge_latest(
    target: DataFrame | None, batch: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Latest-wins merge: one row per key, max order_col (ties broken by
    preferring the incoming batch, tagged _src=1)."""
    batch = batch.withColumn("_src", F.lit(1))
    merged = (
        batch
        if target is None
        else target.withColumn("_src", F.lit(0)).unionByName(batch)
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(order_col), F.desc("_src")
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def upsert_parquet_sink(
    stream: DataFrame,
    sink_dir: str,
    *,
    key_cols: list[str],
    order_col: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start a foreachBatch streaming query that upserts each
    micro-batch into `sink_dir/current` (latest-wins per key)."""
    spark = stream.sparkSession

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        cur_path = os.path.join(sink_dir, CURRENT)
        target = None
        if os.path.exists(cur_path):
            target = spark.read.parquet(cur_path)
        merged = _merge_latest(target, batch, key_cols, order_col)
        staged = os.path.join(sink_dir, f"_staging_v{batch_id}")
        merged.write.mode("overwrite").parquet(staged)
        # Atomic swap: the reader either sees the old snapshot or the
        # new one, never a partial write.
        old = os.path.join(sink_dir, f"_old_v{batch_id}")
        if os.path.exists(cur_path):
            os.rename(cur_path, old)
        os.rename(staged, cur_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
