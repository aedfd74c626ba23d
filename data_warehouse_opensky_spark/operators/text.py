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
