"""End-to-end training-corpus pipeline: the composition a user actually
runs — quality filter → exact dedup → near-dup clustering → eval-set
decontamination → mixture-weighted sampling → sequence packing.

Every stage is one of the individually oracle-gated operators
(plans/corpus.py, plans/dedup.py); this module is their composition
plus a per-stage survivor report. Stage order matters and is the
standard one: cheap row-local filters first (quality — no shuffle),
then exact dedup (one digest shuffle), then the expensive near-dup
pass on the already-shrunk corpus, then decontamination (broadcast
join), then sampling (row-local filter), then packing (per-shard
windows).

Scale notes: intermediates are persisted at the two points where a
stage's output feeds both the next stage and the report count (Spark
recomputes unpersisted diamonds); a 100 TB run would checkpoint
stage boundaries to storage instead and carry the counts via
`observe()` on the stage writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import text as X

#: Near-dup LSH parameters — same family as plans/dedup.py's catalog
#: queries (5-gram shingles, 16 salted minhashes, 4 bands of 4).
_N, _K, _RPB = 5, 16, 4


def quality_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The funnel's cumulative predicate as a filter (row-local)."""
    n_chars = F.length(text_col)
    n_tokens = F.size(F.split(F.col(text_col), " "))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    return docs.filter(
        (n_chars >= X.FUNNEL_MIN_CHARS)
        & n_tokens.between(X.FUNNEL_MIN_TOKENS, X.FUNNEL_MAX_TOKENS)
        & (n_alpha * 1_000_000 >= X.FUNNEL_MIN_ALPHA_E6 * n_chars)
    )


def drop_near_duplicates(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical doc per near-dup cluster (the LSH →
    connected-components keep-list, applied)."""
    sigs = D.minhash_signatures_arrays(docs, n=_N, num_hashes=_K).persist()
    edges = D.bucket_pairs(D.band_signatures(sigs, _K, _RPB))
    comp = D.connected_components(edges)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def corpus_pipeline(
    docs: DataFrame, benchmark: DataFrame | None = None
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full corpus prep; returns (packed sequences, per-stage
    survivor report). `benchmark` (an eval set) enables the
    decontamination stage."""
    report: dict[str, int] = {"input": docs.count()}

    d = quality_filter(docs)
    report["after_quality"] = d.count()

    d = d.withColumn("_digest", F.md5("text")).dropDuplicates(["_digest"]).drop(
        "_digest"
    )
    d = d.persist()
    report["after_exact_dedup"] = d.count()

    d = drop_near_duplicates(d).persist()
    report["after_near_dedup"] = d.count()

    if benchmark is not None:
        flags = X.decontaminate(d, benchmark)
        clean_ids = flags.filter(~F.col("contaminated")).select("doc_id")
        d = d.join(clean_ids, "doc_id", "left_semi").persist()
        report["after_decontaminate"] = d.count()

    d = d.join(
        X.stratified_sample(d).select("doc_id"), "doc_id", "left_semi"
    ).persist()
    report["after_mixture_sample"] = d.count()

    packed = X.pack_sequences(d)
    report["n_sequences"] = packed.count()
    return packed, report
