"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
2003) — the local fingerprinting scheme with a MATCH GUARANTEE: any
shared token run of at least K + W - 1 tokens between two documents is
certain to share at least one selected fingerprint. That guarantee is
what distinguishes winnowing from plain "every i-th hash" sampling
(which can miss arbitrarily long matches) and from MinHash (which
estimates whole-document similarity, not shared substrings); it is the
scheme behind MOSS-style plagiarism detection and is the standard
pre-filter for substring-level dedup of crawl corpora.

Relation to the rest of the dedup surface (reference parity: the
reference repo has no analytical dedup at all — extract_script.py /
load_warehouse.py stop at typed columns; this module belongs to the
mandated north-star T3.2 family):

* operators/text.py `duplicated_spans` reports EVERY duplicated 8-gram
  — exhaustive, shuffle mass = one row per token position.
* plans/dedup.py `dedup_exact_substring_spans` verifies exact spans —
  precise, but again token-position-grain shuffle.
* Winnowing shuffles only ~2/(W+1) of the gram stream (the expected
  selection density) while KEEPING the >= K+W-1 guarantee — at 100 TB
  it is the affordable first pass whose survivors feed the exact
  verifiers above.

Pipeline (all plain relational ops — no UDFs, no HOF-in-HOF
re-evaluation; every step is one window over doc-partitioned rows, so
the whole thing costs ONE hash exchange on doc_id):

  1. token hash: polynomial char fold mod 2^31-1 (operators/text.py
     ROLLING_MOD family), computed inside a single-level `transform`
     over the split array (the lambda touches only its own variable —
     no outer-column recompute), then posexploded to (doc, tpos, th).
  2. gram hash at position p: closed-form degree-(K-1) polynomial in
     37 over th[p..p+K-1] via `lead` — max intermediate
     50653 * (2^31-1) * 4 < 2^63, int64-exact, identical formula on
     both engines.
  3. selection: min over the trailing W-gram frame; a window position
     is REAL once rn >= least(W, n_grams) (short docs with fewer than
     W grams contribute their single all-grams window, the paper's
     boundary case).

K = 4, W = 5 ⇒ guarantee threshold K + W - 1 = 8 tokens — deliberately
the same 8-token grain as operators/text.py SPAN_NGRAM, so winnowing
survivors are directly comparable against the exhaustive span report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import ROLLING_MOD

WINNOW_K = 4  # tokens per gram
WINNOW_W = 5  # grams per selection window
#: drop fingerprints appearing in more than this many documents before
#: the pair join — the hot-shingle cap doctrine (operators/dedup.py):
#: a fingerprint shared by hundreds of documents is boilerplate, and
#: its pair contribution is quadratic in document frequency.
WINNOW_DF_CAP = 50

_GRAM_MULT = 37  # matches operators/text.py ROLL_* gram family
# closed-form coefficients 37^(K-1) .. 37^0 for the K=4 gram hash
_GRAM_COEF = [_GRAM_MULT ** (WINNOW_K - 1 - i) for i in range(WINNOW_K)]

#: Shared DuckDB oracle prefix ending in `win` = the selected
#: fingerprint stream (doc_id, tpos, fp, n_grams) — the SQL twin of
#: `fingerprint_stream`. Both plan oracles (plans/text.py
#: text_winnowing, plans/dedup.py dedup_winnowing_pairs) build on it,
#: with every constant interpolated from the SAME Python values the
#: Spark side uses so the two can never drift.
WINNOW_ORACLE_CTE = f"""
    toks AS (
      SELECT doc_id,
             [list_reduce(list_prepend(CAST(0 AS BIGINT),
                 [CAST(ascii(substring(t, i, 1)) AS BIGINT)
                  for i in range(1, length(t) + 1)]),
               (acc, c) -> (acc * 31 + c) % {ROLLING_MOD})
              for t in string_split(text, ' ') if t != ''] AS th
      FROM documents
    ),
    th AS (
      SELECT doc_id, unnest(range(1, len(th) + 1)) - 1 AS tpos,
             unnest(th) AS h
      FROM toks
    ),
    g AS (
      SELECT doc_id, tpos,
             (h * {_GRAM_COEF[0]}
              + lead(h, 1) OVER w * {_GRAM_COEF[1]}
              + lead(h, 2) OVER w * {_GRAM_COEF[2]}
              + lead(h, 3) OVER w * {_GRAM_COEF[3]}) % {ROLLING_MOD} AS gh
      FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY tpos)
    ),
    sel AS (
      SELECT doc_id, tpos,
             min(gh) OVER (PARTITION BY doc_id ORDER BY tpos
                           ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                           AND CURRENT ROW) AS fp,
             row_number() OVER (PARTITION BY doc_id ORDER BY tpos) AS rn,
             count(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM g WHERE gh IS NOT NULL
    ),
    win AS (
      SELECT doc_id, tpos, fp, n_grams
      FROM sel WHERE rn >= least({WINNOW_W}, n_grams)
    )"""


def _token_hashes(text_col: str) -> Column:
    """array<long> of per-token polynomial char-fold hashes mod 2^31-1.

    Single-level HOF: the inner `aggregate` folds only the lambda's
    own token variable, so Catalyst cannot inline a doc-sized
    recompute into a per-element scope (the O(n^2) trap that rules
    out a transform-of-slices formulation of the gram stage).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return F.transform(
        toks,
        lambda t: F.aggregate(
            F.split(t, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % ROLLING_MOD,
        ),
    )


def fingerprint_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Selected winnowing fingerprints, one row per selection window.

    Returns (id_col, tpos, fp, n_grams): `tpos` is the 0-based token
    position where the selection window ENDS, `fp` the frame-min gram
    hash, `n_grams` the document's gram count (carried for the density
    denominator). Consecutive windows usually re-select the same
    minimum — consumers that want the fingerprint SET dedupe on
    (id, fp); the per-window grain is kept because the window count is
    the guarantee-level denominator.

    Cost model: one exchange on id_col, then token-local window
    arithmetic. The exploded grain is token-scale (same as the tf-idf
    explode) but the DOWNSTREAM join grain after dedup is ~2/(W+1) of
    it — the whole point of winnowing at 100 TB.
    """
    th = docs.select(
        F.col(id_col), F.posexplode(_token_hashes(text_col)).alias("tpos", "th")
    )
    w = Window.partitionBy(id_col).orderBy("tpos")
    gram = sum(
        F.lead("th", i).over(w) * F.lit(c)
        for i, c in enumerate(_GRAM_COEF[1:], start=1)
    ) + F.col("th") * F.lit(_GRAM_COEF[0])
    grams = (
        th.select(F.col(id_col), "tpos", (gram % ROLLING_MOD).alias("gh"))
        .filter(F.col("gh").isNotNull())
    )
    wd = Window.partitionBy(id_col).orderBy("tpos")
    frame = wd.rowsBetween(-(WINNOW_W - 1), 0)
    sel = grams.select(
        F.col(id_col),
        "tpos",
        F.min("gh").over(frame).alias("fp"),
        F.row_number().over(wd).alias("_rn"),
        F.count("*").over(Window.partitionBy(id_col)).alias("n_grams"),
    )
    return sel.filter(
        F.col("_rn") >= F.least(F.lit(WINNOW_W), F.col("n_grams"))
    ).drop("_rn")


def doc_profile(stream: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document winnowing profile from `fingerprint_stream` rows.

    density_e6 = selected-distinct fingerprints per window, in exact
    ppm — the paper's density 2/(W+1) shows up here as the expected
    value for random text.
    """
    return (
        stream.groupBy(id_col)
        .agg(
            F.max("n_grams").cast("long").alias("n_grams"),
            F.count("*").cast("long").alias("n_windows"),
            F.countDistinct("fp").cast("long").alias("n_fps"),
            F.min("fp").cast("long").alias("fp_min"),
            F.max("fp").cast("long").alias("fp_max"),
        )
        .withColumn(
            "density_e6",
            F.expr("n_fps * 1000000 div n_windows").cast("long"),
        )
    )


def pair_candidates(stream: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Candidate near-duplicate pairs: documents sharing >= 2 distinct
    winnowed fingerprints, with ubiquitous fingerprints (document
    frequency > WINNOW_DF_CAP) dropped first.

    Bucket join on fp (the LSH band-join shape — never all-pairs): the
    DF cap bounds every bucket's pair fan-out at cap^2, so the shuffle
    mass is sum-of-bounded-buckets even when boilerplate fingerprints
    saturate a crawl corpus.
    """
    # (doc, fp) grain feeds BOTH the document-frequency agg and the
    # bucket join — persist so the token-explode + window chain above
    # it runs once (cache-lifecycle contract: plans/catalog.py — the
    # session owner clears the cache after its action).
    fps = stream.select(id_col, "fp").distinct().persist()
    df = fps.groupBy("fp").agg(F.count("*").alias("_df"))
    kept = fps.join(df.filter(F.col("_df") <= WINNOW_DF_CAP), "fp")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= 2)
    )
