"""Text-analysis operators (north-star T3.4): language-ID, quality
scoring, token counting, document fingerprinting.

All JVM-side (split / higher-order fns / regexp) — no Python UDFs.
Ratios are emitted as exact integer parts-per-million (`*_e6 =
(num * 1_000_000) // den`) — integer floor division is bit-identical
across engines, unlike float division + round on grid-valued ratios.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lexicon for the heuristic language-ID.
#: (word, lang) — deliberately small and inline so the SQL oracle can
#: embed the identical VALUES list.
LANG_LEXICON: tuple[tuple[str, str], ...] = (
    ("the", "en"), ("a", "en"), ("of", "en"), ("and", "en"), ("to", "en"),
    ("is", "en"), ("in", "en"),
    ("el", "es"), ("la", "es"), ("de", "es"), ("y", "es"), ("los", "es"),
    ("le", "fr"), ("les", "fr"), ("et", "fr"), ("des", "fr"), ("un", "fr"),
    ("der", "de"), ("die", "de"), ("das", "de"), ("und", "de"), ("ein", "de"),
    ("的", "zh"), ("是", "zh"), ("了", "zh"),
)

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "is", "in")

ROLLING_MOD = 2147483647  # 2^31 - 1; keeps acc*31+255 < 2^36 (no overflow)


def tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def rolling_hash(text_col: str = "text") -> Column:
    """Polynomial rolling hash h = Σ 31^i·c_i mod (2^31−1), sequential
    fold — exact integer arithmetic, engine-portable.

    Splits into a char array ONCE (O(n)); the earlier per-position
    `substring(text, i, 1)` form was O(n²) on UTF-8 strings (each
    substring seeks from the start of the varlen encoding).
    """
    return F.expr(
        f"aggregate(transform(split({text_col}, ''),"
        f" c -> CAST(ascii(c) AS BIGINT)),"
        f" CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % {ROLLING_MOD})"
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """md5 of whitespace-normalized lowercase content + rolling hash."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fingerprint_md5"),
        rolling_hash(text_col).alias("rolling_hash"),
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + regex token counts and char counts."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(text_col)).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit("[a-z]+")).cast("long").alias(
            "word_tokens"
        ),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals as exact ppm integers (T3.4).

    alpha_ratio  = alphabetic chars / chars
    stop_ratio   = stopword tokens / tokens
    avg_token_len (ppm) = Σ token length / tokens
    quality      = (alpha + stop + min(tokens,100)·10^4) // 3
    """
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_chars = F.length(text_col).cast("long")
    n_tokens = F.size(tokens(text_col)).cast("long")
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", "")).cast("long")
    sum_tok_len = F.expr(
        f"aggregate(split({text_col}, ' '), CAST(0 AS BIGINT),"
        f" (acc, x) -> acc + length(x))"
    )
    n_stop = F.expr(
        f"CAST(size(filter(split({text_col}, ' '),"
        f" x -> array_contains(array({stop_arr}), x))) AS BIGINT)"
    )
    df = docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_alpha.alias("n_alpha"),
        sum_tok_len.alias("sum_tok_len"),
        n_stop.alias("n_stop"),
    )
    return df.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.expr("(n_alpha * 1000000) div greatest(n_chars, 1)").alias("alpha_ratio_e6"),
        F.expr("(n_stop * 1000000) div greatest(n_tokens, 1)").alias("stop_ratio_e6"),
        F.expr("(sum_tok_len * 1000000) div greatest(n_tokens, 1)").alias(
            "avg_token_len_e6"
        ),
        F.expr(
            "((n_alpha * 1000000) div greatest(n_chars, 1)"
            " + (n_stop * 1000000) div greatest(n_tokens, 1)"
            " + least(n_tokens, 100) * 10000) div 3"
        ).alias("quality_e6"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-lexicon language guess: argmax hits, ties → lang asc,
    zero hits → 'unknown'. Single shuffle on doc_id."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    lex = spark.createDataFrame(list(LANG_LEXICON), ["t", "lang_guess"])
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
    )
    hits = (
        tok.join(F.broadcast(lex), "t")
        .groupBy("doc_id", "lang_guess")
        .agg(F.count("*").alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("lang_guess"))
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang_guess", "n_hits")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col("lang").alias("actual_lang"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("lang_guess", F.lit("unknown")).alias("pred_lang"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            "actual_lang",
            F.when(F.col("lang_guess") == F.col("actual_lang"), 1)
            .otherwise(0)
            .alias("is_match"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-preparation operators (north-star training-data pipeline)
# ---------------------------------------------------------------------------

#: Per-language per-mille sampling rates for the stratified corpus
#: sample (keep md5-bucket < rate). Inline so the SQL oracle embeds the
#: identical VALUES list. The shape mirrors real pretraining mixes:
#: down-sample over-represented languages, keep the tail.
STRATA_RATES: tuple[tuple[str, int], ...] = (
    ("en", 80),
    ("de", 200),
    ("es", 300),
    ("fr", 500),
    ("zh", 900),
)

#: Email-ish and digit-run patterns for PII scrubbing. Both are RE2- and
#: java.util.regex-portable (no backrefs, no lookaround).
PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+"
PII_DIGITS_RE = "[0-9]+"


def chunk_documents(
    docs: DataFrame,
    *,
    size: int = 120,
    stride: int = 90,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size overlapping character chunks.

    The LLM-context-window prep step: chunk starts are 1, 1+stride,
    1+2·stride, … while start ≤ length(text); each chunk is
    `substring(text, start, size)` (the last chunk may be short).

    Scale: entirely row-local — `sequence` + `explode` generate chunk
    rows inside the scan task with zero shuffles; output partitioning
    inherits the input's. At 100 TB this is the shape you want: chunking
    is a flat-map, never an aggregation.
    """
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(text_col), F.lit(1)), F.lit(stride)
    )
    chunk = F.expr(f"substring({text_col}, start, {size})")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col),
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start_pos"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, exact-integer.

    Per document: token count, distinct-token count, most-frequent-token
    count, bigram count, distinct-bigram count, most-frequent-bigram
    count, plus ppm ratios (duplicate-token fraction, top-bigram
    fraction) — the signals used to drop template/boilerplate docs from
    training corpora.

    Scale: ONE explode of a tagged (kind, entry) array — tokens and
    bigrams ride the same shuffle — then two hash aggregations
    ((doc_id, kind, entry) → doc_id), both map-side combinable. No
    joins, no row-local O(n²) distinct scans.
    """
    # Tokenize ONCE into a column — referencing split() inside the
    # bigram lambda would re-split the text per element (O(n²) chars).
    toked = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    # Bigrams as zip_with of the array against its own 1-shift; slice
    # length size-1 is 0 for single-token docs → empty array, no
    # out-of-range element_at.
    bigrams = F.expr(
        "zip_with(slice(toks, 1, size(toks) - 1),"
        " slice(toks, 2, size(toks) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    tagged = F.concat(
        F.transform(
            F.col("toks"),
            lambda t: F.struct(F.lit("T").alias("kind"), t.alias("entry")),
        ),
        F.transform(
            bigrams, lambda b: F.struct(F.lit("B").alias("kind"), b.alias("entry"))
        ),
    )
    exploded = toked.select("doc_id", F.explode(tagged).alias("e")).select(
        "doc_id", F.col("e.kind").alias("kind"), F.col("e.entry").alias("entry")
    )
    per_entry = exploded.groupBy("doc_id", "kind", "entry").agg(
        F.count("*").alias("c")
    )
    is_t = F.col("kind") == "T"
    agg = per_entry.groupBy("doc_id").agg(
        F.sum(F.when(is_t, F.col("c"))).cast("long").alias("n_tokens"),
        F.count(F.when(is_t, 1)).cast("long").alias("n_distinct_tokens"),
        F.max(F.when(is_t, F.col("c"))).cast("long").alias("max_token_freq"),
        F.coalesce(F.sum(F.when(~is_t, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("n_bigrams"),
        F.count(F.when(~is_t, 1)).cast("long").alias("n_distinct_bigrams"),
        F.coalesce(F.max(F.when(~is_t, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("max_bigram_freq"),
    )
    return agg.select(
        "*",
        F.expr(
            "(n_tokens - n_distinct_tokens) * 1000000 div greatest(n_tokens, 1)"
        ).alias("dup_token_ratio_e6"),
        F.expr("max_bigram_freq * 1000000 div greatest(n_bigrams, 1)").alias(
            "top_bigram_ratio_e6"
        ),
    )


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Regex PII scrub: count and redact email-ish tokens and digit runs.

    Redaction order matters (emails contain digits): emails → <EMAIL>
    first, then digit runs → <NUM>. Everything is JVM-side regexp —
    row-local, zero shuffles, pushdown-friendly.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
        PII_DIGITS_RE,
        "<NUM>",
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PII_DIGITS_RE))
        .cast("long")
        .alias("n_digit_runs"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: tuple[tuple[str, int], ...] = STRATA_RATES,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic per-stratum hash sample: keep a row iff
    md5(id) mod 1000 < rate(stratum).

    Reproducible across engines and re-runs (unlike RNG sampling), and
    the per-stratum rate lives in a broadcast dimension — the standard
    corpus-mixing shape (down-weight over-represented languages). At
    100 TB the md5-bucket filter runs inside the scan and the rate
    lookup is a broadcast hash join — no shuffle of the fact side.
    """
    spark = docs.sparkSession
    rates_df = spark.createDataFrame(list(rates), [stratum_col, "keep_per_mille"])
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    return (
        docs.join(F.broadcast(rates_df), stratum_col)
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("keep_per_mille"))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.col("bucket").cast("long").alias("bucket"),
        )
    )
