"""Corpus-preparation queries over `documents` (north-star training-data
pipeline, SURVEY T3.4 extensions): chunking, repetition quality signals,
PII scrubbing, stratified sampling.

These are the operators a pretraining-data pipeline runs between raw
crawl and tokenizer — the same tier as dedup/similarity (plans/dedup.py,
plans/similarity.py), extending the reference's clean-zone transform
(load_warehouse.py:63-91 — its notion of "clean" is typed columns; a
training corpus's notion of clean adds chunk/quality/PII/mix steps).

All exact-integer or md5-valued so the DuckDB oracles are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import text as X
from ..sources import load_table
from .catalog import query

_RATES_SQL = ", ".join(f"('{s}', {r})" for s, r in X.STRATA_RATES)


@query(
    "corpus_chunking",
    tier="T3",
    doc="Fixed-size overlapping character chunks (size 120, stride 90) "
    "per document — the LLM context-window prep step. Row-local "
    "sequence+explode flat-map, zero shuffles; chunk identity gated "
    "by md5.",
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text), 1) + 1, 90)) AS start
      FROM documents
    )
    SELECT doc_id,
           CAST((start - 1) // 90 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start_pos,
           CAST(length(substring(text, CAST(start AS INT), 120)) AS BIGINT)
             AS chunk_len,
           md5(substring(text, CAST(start AS INT), 120)) AS chunk_md5
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
)
def corpus_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.chunk_documents(d, size=120, stride=90).orderBy("doc_id", "chunk_idx")


@query(
    "corpus_repetition_signals",
    tier="T3",
    doc="Gopher-style repetition signals (duplicate-token fraction, "
    "top-bigram fraction) as exact ppm integers — the boilerplate/"
    "template filter of a training pipeline. One tagged explode "
    "(tokens + bigrams share the shuffle), two map-side-combinable "
    "hash aggs, no joins.",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS e FROM documents
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i + 1])) AS e
      FROM documents
    ),
    ta AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct_tokens,
             CAST(max(c) AS BIGINT) AS max_token_freq
      FROM (SELECT doc_id, e, count(*) AS c FROM tok GROUP BY 1, 2)
      GROUP BY 1
    ),
    ba AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
             CAST(max(c) AS BIGINT) AS max_bigram_freq
      FROM (SELECT doc_id, e, count(*) AS c FROM big GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT ta.doc_id, ta.n_tokens, ta.n_distinct_tokens, ta.max_token_freq,
           coalesce(ba.n_bigrams, 0) AS n_bigrams,
           coalesce(ba.n_distinct_bigrams, 0) AS n_distinct_bigrams,
           coalesce(ba.max_bigram_freq, 0) AS max_bigram_freq,
           (ta.n_tokens - ta.n_distinct_tokens) * 1000000
             // greatest(ta.n_tokens, 1) AS dup_token_ratio_e6,
           coalesce(ba.max_bigram_freq, 0) * 1000000
             // greatest(coalesce(ba.n_bigrams, 0), 1) AS top_bigram_ratio_e6
    FROM ta LEFT JOIN ba USING (doc_id)
    ORDER BY doc_id
    """,
)
def corpus_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.repetition_signals(d).orderBy("doc_id")


@query(
    "corpus_pii_redact",
    tier="T3",
    doc="Regex PII scrub: count + redact email-ish tokens and digit "
    "runs (emails first — they contain digits), gate the redacted "
    "text by md5. Row-local JVM regexp, zero shuffles; patterns are "
    "RE2/java.util.regex-portable.",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{X.PII_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{X.PII_DIGITS_RE}')) AS BIGINT)
             AS n_digit_runs,
           CAST(length(redacted) AS BIGINT) AS redacted_len,
           md5(redacted) AS redacted_md5
    FROM (
      SELECT doc_id, text,
             regexp_replace(
               regexp_replace(text, '{X.PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{X.PII_DIGITS_RE}', '<NUM>', 'g') AS redacted
      FROM documents
    )
    ORDER BY doc_id
    """,
)
def corpus_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.pii_redact(d).orderBy("doc_id")


@query(
    "corpus_stratified_sample",
    tier="T3",
    doc="Deterministic stratified sample: keep a doc iff md5(doc_id) "
    "mod 1000 < per-language rate from a broadcast rates dimension — "
    "the corpus-mixing step (down-sample over-represented languages). "
    "Reproducible across engines/re-runs unlike RNG sampling; at "
    "100 TB the bucket filter runs in the scan and the rate lookup is "
    "a broadcast join.",
    oracle=f"""
    WITH rates(stratum, keep_per_mille) AS (VALUES {_RATES_SQL})
    SELECT d.doc_id, d.lang AS stratum,
           CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 1000 AS bucket
    FROM documents d JOIN rates r ON d.lang = r.stratum
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000 < r.keep_per_mille
    ORDER BY d.doc_id
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.stratified_sample(d).orderBy("doc_id")
