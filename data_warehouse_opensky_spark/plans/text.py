"""Tier-3 text-analysis queries over `documents` (north-star T3.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as X
from ..sources import load_table
from .catalog import query

_STOP_SQL = ", ".join(f"'{w}'" for w in X.STOPWORDS)
_LEX_SQL = ", ".join(f"('{w}', '{lang}')" for w, lang in X.LANG_LEXICON)


@query(
    "text_token_count",
    tier="T3",
    doc="Whitespace + regex token counting (T3.4).",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS word_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.token_stats(d).orderBy("doc_id")


@query(
    "text_quality_score",
    tier="T3",
    doc="Quality signals as exact ppm integers (T3.4): alpha ratio, "
    "stopword ratio, avg token length, composite score.",
    oracle=f"""
    WITH x AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
             CAST(list_sum([length(t) for t in string_split(text, ' ')]) AS BIGINT)
               AS sum_tok_len,
             CAST(len([t for t in string_split(text, ' ')
                       if list_contains([{_STOP_SQL}], t)]) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           (n_alpha * 1000000) // greatest(n_chars, 1) AS alpha_ratio_e6,
           (n_stop * 1000000) // greatest(n_tokens, 1) AS stop_ratio_e6,
           (sum_tok_len * 1000000) // greatest(n_tokens, 1) AS avg_token_len_e6,
           ((n_alpha * 1000000) // greatest(n_chars, 1)
            + (n_stop * 1000000) // greatest(n_tokens, 1)
            + least(n_tokens, 100) * 10000) // 3 AS quality_e6
    FROM x
    ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.quality_score(d).orderBy("doc_id")


@query(
    "text_lang_id",
    tier="T3",
    doc="Heuristic language-ID: stopword-lexicon argmax (T3.4). "
    "Ties → lang asc; no hits → 'unknown'.",
    oracle=f"""
    WITH lex(t, lang_guess) AS (VALUES {_LEX_SQL}),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    hits AS (
      SELECT doc_id, lang_guess, count(*) AS n_hits
      FROM tok JOIN lex USING (t)
      GROUP BY doc_id, lang_guess
    ),
    best AS (
      SELECT doc_id, lang_guess, n_hits FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY n_hits DESC, lang_guess) AS rn
        FROM hits
      ) WHERE rn = 1
    )
    SELECT d.doc_id,
           coalesce(b.lang_guess, 'unknown') AS pred_lang,
           CAST(coalesce(b.n_hits, 0) AS BIGINT) AS n_hits,
           d.lang AS actual_lang,
           CASE WHEN b.lang_guess = d.lang THEN 1 ELSE 0 END AS is_match
    FROM documents d LEFT JOIN best b USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return X.lang_id(d).orderBy("doc_id")


@query(
    "text_fingerprint",
    tier="T3",
    doc="Document fingerprinting (T3.4): md5 of normalized content + "
    "polynomial rolling hash mod 2^31−1 (exact integer fold).",
    oracle=f"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint_md5,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(substring(text, i, 1)) AS BIGINT)
                for i in range(1, length(text) + 1)]),
             (acc, x) -> (acc * 31 + x) % {X.ROLLING_MOD}) AS rolling_hash
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", spread=True)
    return X.fingerprint(d).orderBy("doc_id")


@query(
    "text_tfidf_topk",
    tier="T3",
    doc="TF-IDF top-3 salient terms per document (T3.4). tf/df are "
    "exact integers; idf = ln((N+1)/(df+1)) is continuous so the "
    "score rounds at 6 dp, and ranking uses the rounded score with a "
    "term tiebreak so both engines rank identically. Scale: tf is one "
    "token-explode shuffle, df is a broadcast-back vocabulary agg, "
    "top-3 rides WindowGroupLimit.",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM tok WHERE term != '' GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)),
                   6) AS tfidf
      FROM tf, df, n WHERE df.term = tf.term
    )
    SELECT doc_id, term, tf, tfidf FROM (
      SELECT *,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    ORDER BY doc_id, rn
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    # Vocabulary (distinct-term) broadcast is the fast path; a web-scale
    # corpus can exceed the broadcast threshold, so the hint is gated by
    # config: set spark.data_warehouse.tfidf.broadcastVocab=false to
    # fall back to a shuffle join on `term` (tf is already partitioned
    # by (doc_id, term) from its groupBy; the df agg reuses the same
    # exchange on term). SCALE.md §text documents the crossover.
    bcast = (
        spark.conf.get("spark.data_warehouse.tfidf.broadcastVocab", "true")
        == "true"
    )
    df_side = F.broadcast(df) if bcast else df
    scored = (
        tf.join(df_side, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n_docs") + 1)
                    / (F.col("df") + 1).cast("double")
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "term")
    )


@query(
    "text_bigram_logprob",
    tier="T3",
    doc="Char-bigram LM quality score (CCNet-style): each doc's average "
    "log-probability under the corpus's own bigram distribution — "
    "gibberish scores far from the corpus mode with no external "
    "model. Each distinct bigram's ln(c/total) rounds to an e6 "
    "integer ONCE; per-doc scores are exact integer sums (never a "
    "float sum — partial-agg order is nondeterministic). Model table "
    "bounded by charset², broadcast.",
    oracle="""
    WITH bg AS (
      SELECT doc_id, substring(text, CAST(i AS INT), 2) AS bg
      FROM documents, unnest(range(1, length(text))) AS u(i)
      WHERE length(text) >= 2
    ),
    counts AS (SELECT bg, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY bg),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM counts),
    model AS (
      SELECT bg, CAST(round(ln(CAST(c AS DOUBLE) / n_total) * 1000000)
                      AS BIGINT) AS logp_e6
      FROM counts, total
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(count(m.logp_e6) AS BIGINT) AS n_bigrams,
             CAST(coalesce(sum(m.logp_e6), 0) AS BIGINT) AS sum_logp_e6
      FROM bg b LEFT JOIN model m ON b.bg = m.bg
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(s.sum_logp_e6, 0) AS BIGINT) AS sum_logp_e6,
           CAST(coalesce(s.sum_logp_e6, 0)
                // greatest(coalesce(s.n_bigrams, 0), 1) AS BIGINT)
             AS avg_logp_e6
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", spread=True)
    return X.bigram_logprob(d).orderBy("doc_id")


# --------------------------------------------------------------------------
# T3.4 — corpus heavy hitters: Misra–Gries propose, exact verify
# --------------------------------------------------------------------------
@query(
    "text_heavy_hitters",
    tier="T3",
    doc="Tokens appearing ≥ N/200 times corpus-wide, mined with the "
    "two-phase scale shape: per-partition Misra–Gries sketches "
    "(capacity 512, Arrow-vectorized) propose a guaranteed-superset "
    "candidate set; a broadcast semi-join + exact count verifies — "
    "the long tail never shuffles. The output is the EXACT "
    "heavy-hitter set for any partitioning, which is why a plain "
    "GROUP BY/HAVING oracle gates it. See operators/freq.py for the "
    "mergeable-summaries guarantee.",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    t2 AS (SELECT token FROM tok WHERE token <> ''),
    tot AS (SELECT count(*) AS n FROM t2)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM t2, tot
    GROUP BY token, n
    HAVING count(*) >= greatest(n // 200, 1)
    ORDER BY cnt DESC, token
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.freq import heavy_hitters

    d = load_table(spark, sf_dir, "documents", spread=True)
    tokens = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    return heavy_hitters(tokens, col="token", inv_threshold=200).orderBy(
        F.desc("cnt"), "token"
    )


# --------------------------------------------------------------------------
# T3.4 — inverted index (token → posting list), the retrieval primitive
# --------------------------------------------------------------------------
@query(
    "text_inverted_index",
    tier="T3",
    doc="Inverted-index build: token → document frequency + posting "
    "list (first 15 doc_ids, ascending, comma-joined so the contract "
    "is a flat string, not an engine-specific array rendering). "
    "Distinct (token, doc) postings via one explode + distinct; df "
    "filter ≥ 5 bounds the emitted vocabulary. One shuffle on token — "
    "the same key the index is range-partitioned by at 100 TB — and "
    "the posting-list truncation caps per-token memory: full-scale "
    "indexes store postings as sorted runs per (token, shard) rather "
    "than one giant array (the slice() here is the honest stand-in "
    "for that cap). Retrieval side is ann/tfidf queries; this is the "
    "build side.",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> '')
    SELECT token,
           count(*) AS df,
           array_to_string(list_sort(list(doc_id))[1:15], ',')
             AS posting_head
    FROM t2
    GROUP BY token
    HAVING count(*) >= 5
    ORDER BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", spread=True)
    postings = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        postings.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 15), ","
            ).alias("posting_head"),
        )
        .filter(F.col("df") >= 5)
        .orderBy("token")
    )


# --------------------------------------------------------------------------
# T3.4 — character-entropy quality signal
# --------------------------------------------------------------------------
@query(
    "text_char_entropy",
    tier="T3",
    doc="Shannon character entropy per document — the compressibility "
    "quality signal (gibberish and boilerplate both sit at entropy "
    "extremes). Computed from EXACT integer char counts via the "
    "H = log2(n) − Σc·log2(c)/n identity: one tagged explode to "
    "(doc, char) counts (map-side combined), one per-doc agg; the "
    "only floats are per-term log2 of integers summed over ≤ "
    "|alphabet| terms, rounded to 6 dp (both engines' libm log2 "
    "agree to an ulp — far inside the rounding guard). Low-entropy "
    "gate flags repetitive docs. Same two-agg shape as the "
    "repetition signals — linear scan, no joins against the fact.",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS c
      FROM documents
    ),
    f AS (
      SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
      FROM ch WHERE c <> '' GROUP BY doc_id, c
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           round(log2(CAST(sum(cnt) AS DOUBLE))
                 - sum(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE)))
                   / CAST(sum(cnt) AS DOUBLE), 6) AS entropy_bits,
           round(log2(CAST(sum(cnt) AS DOUBLE))
                 - sum(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE)))
                   / CAST(sum(cnt) AS DOUBLE), 6) < 3.0 AS low_entropy
    FROM f GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", spread=True)
    f = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("cnt"))
    )
    n = F.sum("cnt").cast("double")
    ent = F.round(
        F.log2(n)
        - F.sum(F.col("cnt").cast("double") * F.log2(F.col("cnt").cast("double")))
        / n,
        6,
    )
    return (
        f.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_chars"),
            F.count("*").cast("long").alias("n_distinct_chars"),
            ent.alias("entropy_bits"),
            (ent < 3.0).alias("low_entropy"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T3.4 — classifier evaluation: lang-ID confusion matrix vs labels
# --------------------------------------------------------------------------
@query(
    "text_langid_confusion",
    tier="T3",
    doc="Model-eval shape: the heuristic language-ID's CONFUSION "
    "MATRIX against the labeled `lang` column — per (actual, "
    "predicted) cell, count and recall-within-actual (round-6), the "
    "evaluation every classifier-in-the-pipeline needs before its "
    "predictions feed downstream filters. Rides the existing lang_id "
    "operator output; one |labels|²-row agg + a broadcast of per-"
    "actual totals. At 100 TB the eval runs on a held-out sample "
    "(corpus_split_assign) — same plan.",
    oracle=f"""
    WITH lex(t, lang_guess) AS (VALUES {_LEX_SQL}),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    hits AS (
      SELECT doc_id, lang_guess, count(*) AS n_hits
      FROM tok JOIN lex USING (t)
      GROUP BY doc_id, lang_guess
    ),
    best AS (
      SELECT doc_id, lang_guess FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY n_hits DESC, lang_guess) AS rn
        FROM hits
      ) WHERE rn = 1
    ),
    cell AS (
      SELECT d.lang AS actual_lang,
             coalesce(b.lang_guess, 'unknown') AS pred_lang,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents d LEFT JOIN best b USING (doc_id)
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT actual_lang, CAST(sum(n_docs) AS BIGINT) AS n_actual
      FROM cell GROUP BY 1
    )
    SELECT c.actual_lang, c.pred_lang, c.n_docs,
           round(CAST(c.n_docs AS DOUBLE) / t.n_actual, 6) AS frac_of_actual
    FROM cell c JOIN tot t USING (actual_lang)
    ORDER BY c.actual_lang, c.pred_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", spread=True)
    pred = X.lang_id(d).select(
        "doc_id", F.col("pred_lang")
    )
    cell = (
        d.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(pred, "doc_id", "left")
        .groupBy(
            "actual_lang",
            F.coalesce("pred_lang", F.lit("unknown")).alias("pred_lang"),
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tot = cell.groupBy("actual_lang").agg(
        F.sum("n_docs").cast("long").alias("n_actual")
    )
    return (
        cell.join(F.broadcast(tot), "actual_lang")
        .select(
            "actual_lang",
            "pred_lang",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_actual"), 6
            ).alias("frac_of_actual"),
        )
        .orderBy("actual_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# T3.4 — Zipf rank-frequency fit (corpus-health diagnostic)
# --------------------------------------------------------------------------
_ZIPF_TOPN = 100


@query(
    "text_zipf_slope",
    tier="T3",
    doc="Zipf's-law fit: least-squares slope of log(freq) vs log(rank) "
    f"over the top-{_ZIPF_TOPN} tokens — natural text sits near −1; a "
    "slope far off flags template/boilerplate corpora or tokenizer "
    "bugs before training data ships. Counts and ranking are exact "
    "integers with a (count desc, token) total order; the regression "
    f"sums are doubles over only {_ZIPF_TOPN} pre-aggregated terms "
    "(the char-entropy doctrine: bounded-cardinality log sums with a "
    "round-6 guard; the top frame is coalesced so the fold order is "
    "fixed). Scale: one token-explode shuffle + one count agg — the "
    f"global sort stops at a {_ZIPF_TOPN}-row TakeOrdered; the window "
    "runs on that tiny frame only.",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    c AS (
      SELECT t, CAST(count(*) AS BIGINT) AS cnt
      FROM tok WHERE t <> '' GROUP BY t
    ),
    top AS (
      SELECT t, cnt, row_number() OVER (ORDER BY cnt DESC, t) AS rnk
      FROM c ORDER BY cnt DESC, t LIMIT {_ZIPF_TOPN}
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(ln(CAST(rnk AS DOUBLE))) AS sx,
             sum(ln(CAST(cnt AS DOUBLE))) AS sy,
             sum(ln(CAST(rnk AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))) AS sxy,
             sum(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))) AS sxx
      FROM top
    )
    SELECT CAST(s.n AS BIGINT) AS n_terms,
           t1.t AS top_token,
           t1.cnt AS top_count,
           round((s.n * s.sxy - s.sx * s.sy)
                 / (s.n * s.sxx - s.sx * s.sx), 6) AS zipf_slope,
           round((s.sy - (s.n * s.sxy - s.sx * s.sy)
                         / (s.n * s.sxx - s.sx * s.sx) * s.sx) / s.n, 6)
             AS zipf_intercept
    FROM s, (SELECT t, cnt FROM top WHERE rnk = 1) t1
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", spread=True)
    c = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # TakeOrderedAndProject stops the global sort at TOPN rows; the
    # single-partition window below runs on that tiny frame only
    # (pre-aggregated-series exemption, plans/catalog.py doctrine).
    top = (
        c.orderBy(F.desc("cnt"), "t")
        .limit(_ZIPF_TOPN)
        .coalesce(1)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "t")),
        )
    )
    lx = F.log(F.col("rnk").cast("double"))
    ly = F.log(F.col("cnt").cast("double"))
    s = top.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    t1 = top.filter(F.col("rnk") == 1).select(
        F.col("t").alias("top_token"), F.col("cnt").alias("top_count")
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.crossJoin(t1).select(
        F.col("n").cast("long").alias("n_terms"),
        "top_token",
        F.col("top_count").cast("long").alias("top_count"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("zipf_intercept"),
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval (fixed query, exact-arithmetic scoring)
# --------------------------------------------------------------------------
#: Fixed query terms for the BM25 demo (the online query is a literal;
#: the offline side — tf/df/dl/avgdl — is what a 100 TB index stores).
BM25_TERMS = ("spark", "vector", "window")
#: k1/b chosen BINARY-EXACT (1.5 and 0.75 are dyadic rationals) so the
#: scoring chain is the same IEEE doubles in every engine.
BM25_K1 = 1.5
BM25_B = 0.75


@query(
    "text_bm25_topk",
    tier="T3",
    doc="BM25 top-10 documents for a fixed 3-term query: the ranked-"
    "retrieval twin of text_tfidf_topk. Determinism design: dl/tf/df/"
    "N/Σdl are exact integers; k1=1.5, b=0.75 are dyadic (binary-"
    "exact); the per-term score chains correctly-rounded IEEE ops "
    "written IDENTICALLY in both engines, and the 3 term scores are "
    "added in FIXED textual order (conditional-max pivot, never a "
    "float SUM over rows whose fold order Spark doesn't define). "
    "Scale: tf explode + two small aggs; the query-term filter "
    "prunes the posting explode to |Q| terms before any shuffle; "
    "df and the (N, Σdl) scalars are control-plane broadcasts — the "
    "same shape an inverted-index scorer runs at 100 TB.",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN {BM25_TERMS!r} GROUP BY 1, 2
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    p AS (
      SELECT d.doc_id, d.dl, g.n_docs, g.sum_dl,
             {" , ".join(
               f"max(CASE WHEN tf.term = '{t}' THEN tf.tf ELSE 0 END) AS tf_{t}, "
               f"max(CASE WHEN tf.term = '{t}' THEN df.df ELSE 0 END) AS df_{t}"
               for t in BM25_TERMS)}
      FROM d CROSS JOIN g
      LEFT JOIN tf ON tf.doc_id = d.doc_id
      LEFT JOIN df ON df.term = tf.term
      GROUP BY d.doc_id, d.dl, g.n_docs, g.sum_dl
    )
    SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in BM25_TERMS)},
           round(
             {" + ".join(
               f"(ln(1 + (CAST(n_docs - df_{t} AS DOUBLE) + 0.5)"
               f" / (CAST(df_{t} AS DOUBLE) + 0.5))"
               f" * (CAST(tf_{t} AS DOUBLE) * ({BM25_K1} + 1))"
               f" / (CAST(tf_{t} AS DOUBLE) + {BM25_K1} * (1 - {BM25_B}"
               f" + {BM25_B} * (CAST(dl * n_docs AS DOUBLE)"
               f" / CAST(sum_dl AS DOUBLE)))))"
               for t in BM25_TERMS)}, 6) AS bm25
    FROM p
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    g = d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(*BM25_TERMS))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    pivoted = (
        d.crossJoin(F.broadcast(g))
        .join(tf, "doc_id", "left")
        .join(F.broadcast(df), "term", "left")
        .groupBy("doc_id", "dl", "n_docs", "sum_dl")
        .agg(
            *[
                agg
                for t in BM25_TERMS
                for agg in (
                    F.max(
                        F.when(F.col("term") == t, F.col("tf")).otherwise(0)
                    ).alias(f"tf_{t}"),
                    F.max(
                        F.when(F.col("term") == t, F.col("df")).otherwise(0)
                    ).alias(f"df_{t}"),
                )
            ]
        )
    )
    # Same textual formula and association order as the oracle.
    score = None
    for t in BM25_TERMS:
        term_score = F.expr(
            f"ln(1 + (cast(n_docs - df_{t} as double) + 0.5)"
            f" / (cast(df_{t} as double) + 0.5))"
            f" * (cast(tf_{t} as double) * ({BM25_K1} + 1))"
            f" / (cast(tf_{t} as double) + {BM25_K1} * (1 - {BM25_B}"
            f" + {BM25_B} * (cast(dl * n_docs as double)"
            f" / cast(sum_dl as double))))"
        )
        score = term_score if score is None else score + term_score
    return (
        pivoted.select(
            "doc_id",
            "dl",
            *[F.col(f"tf_{t}") for t in BM25_TERMS],
            F.round(score, 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# T3 — BPE tokenizer training rounds (the LLM-pipeline vocab-build step)
# --------------------------------------------------------------------------
_BPE_ROUNDS = 5


def _bpe_train_ctes() -> list[str]:
    """The shared BPE-training CTE chain (word kept through every
    round so the encode query can join the trained vocab back to the
    corpus; the merges query simply doesn't select it)."""
    ctes = [
        """w AS (
      SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
      FROM documents, unnest(regexp_extract_all(text, '[a-z]+')) AS u(t)
      GROUP BY t
    )""",
        r"""s0 AS (
      SELECT word, regexp_replace(word, '(.)', ' \1 ', 'g') AS seq, freq
      FROM w
    )""",
    ]
    for k in range(1, _BPE_ROUNDS + 1):
        ctes.append(
            f"""p{k} AS (
      SELECT tok[i] AS l, tok[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS c
      FROM (
        SELECT tok, freq, unnest(generate_series(1, len(tok) - 1)) AS i
        FROM (SELECT string_split(trim(seq), '  ') AS tok, freq FROM s{k - 1})
      )
      GROUP BY 1, 2
    )""",
        )
        ctes.append(
            f"""t{k} AS (
      SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1
    )""",
        )
        ctes.append(
            f"""s{k} AS (
      SELECT word, replace(seq, ' ' || l || '  ' || r || ' ',
                     ' ' || l || r || ' ') AS seq, freq
      FROM s{k - 1}, t{k}
    )""",
        )
    return ctes


def _bpe_oracle() -> str:
    """DuckDB twin of the distributed BPE loop, unrolled to K CTE rounds.

    Token sequences are encoded as ' t1  t2  ... tn ' — every token
    carries its OWN flanking single spaces, so adjacent tokens meet at
    a double space. A merge of pair (l, r) is then the literal
    replace of ' l  r ' with ' lr ': the pattern spans both tokens'
    full delimited extents, cannot match inside a token (tokens are
    space-free) or across a half-token (every token edge is guarded
    by its flank), and left-to-right non-overlapping replace IS the
    BPE greedy leftmost merge — both engines' `replace` scans the
    input exactly once.
    """
    ctes = _bpe_train_ctes()
    unions = "\n      UNION ALL ".join(
        f"SELECT {k} AS rank, l, r, c FROM t{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT * FROM ({unions}) ORDER BY rank"
    )


@query(
    "text_bpe_merges",
    tier="T3",
    doc=f"BPE tokenizer training, first {_BPE_ROUNDS} merge rounds over "
    "the word-frequency table (T3.4 — the vocab-build step of an LLM "
    "data pipeline). The corpus collapses to (word, freq) ONCE (one "
    "shuffle on word — at 100 TB this is the classic combiner-friendly "
    "word count), and every round after that runs on the VOCABULARY, "
    "not the corpus: one scan of the word table per round emits "
    "adjacent token pairs row-locally (zip of the token array with its "
    "own tail), a map-side-combined sum picks the globally most "
    "frequent pair, and the 1-row argmax (ORDER BY c DESC, l, r — "
    "deterministic total tie-break) is collected as control-plane "
    "(catalog budget class: K rows total) and applied as a row-local "
    "literal string replace. Sequences encode tokens with their own "
    "space flanks (' l  r ' -> ' lr '), so single-pass non-overlapping "
    "replace IS BPE's greedy leftmost merge in both engines. The vocab "
    "table is persisted; each round's merge extends a narrow "
    "withColumn chain over it.",
    oracle=_bpe_oracle(),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, merges = bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank INT, l STRING, r STRING, c BIGINT"
    ).orderBy("rank")


def bpe_train(spark: SparkSession, sf_dir: str):
    """Shared BPE training core: returns (final merged vocab frame
    (word, seq, freq) — persisted, session owner clears — and the
    merges list [(rank, l, r, count)]). Each round's argmax is a 1-row
    control-plane collect; merges apply as row-local literal replaces
    over the persisted vocab (word kept so the encode query can join
    the trained vocab back onto the corpus)."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(
                F.expr("regexp_extract_all(text, '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word",
            F.regexp_replace("word", "(.)", " $1 ").alias("seq"),
            "freq",
        )
        .persist()
    )
    pairs = F.expr(
        "filter(zip_with(tok, slice(tok, 2, size(tok)), "
        "(a, b) -> struct(a AS l, b AS r)), s -> s.r IS NOT NULL)"
    )
    cur = vocab
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, _BPE_ROUNDS + 1):
        top = (
            cur.select(
                F.split(F.trim(F.col("seq")), "  ").alias("tok"), "freq"
            )
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((k, left, right, cnt))
        # Tokens are [a-z]+ only, so the literal splice is injection-safe.
        cur = cur.withColumn(
            "seq",
            F.expr(
                f"replace(seq, ' {left}  {right} ', ' {left}{right} ')"
            ),
        )
    return cur.persist(), merges


# --------------------------------------------------------------------------
# Winnowing fingerprints (round 9) — local fingerprinting with the
# K+W-1 match guarantee; operator + doctrine in operators/winnow.py.
# --------------------------------------------------------------------------
from ..operators import winnow as WN  # noqa: E402


@query(
    "text_winnowing",
    tier="T3",
    doc="Per-document winnowing profile (Schleimer et al. 2003, the "
    "MOSS fingerprinting scheme; T3.4): polynomial 4-token-gram "
    "hashes, min selected over every 5-gram window, distinct selected "
    "set per document — any shared run of >= K+W-1 = 8 tokens is "
    "GUARANTEED to share a fingerprint (same 8-token grain as "
    "operators/text.py SPAN_NGRAM, so winnowing's ~2/(W+1) density "
    "is directly comparable to the exhaustive span report it "
    "pre-filters for). density_e6 is exact ppm; observed mean "
    "~0.36e6 vs the paper's 2/(W+1) = 0.33e6 expectation. One "
    "exchange on doc_id; every other step is a doc-local window.",
    oracle=f"""
    WITH {WN.WINNOW_ORACLE_CTE}
    SELECT doc_id,
           CAST(max(n_grams) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_fps,
           CAST(min(fp) AS BIGINT) AS fp_min,
           CAST(max(fp) AS BIGINT) AS fp_max,
           CAST(count(DISTINCT fp) * 1000000 // count(*) AS BIGINT)
             AS density_e6
    FROM win GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return WN.doc_profile(WN.fingerprint_stream(d)).orderBy("doc_id")


@query(
    "text_repetition_ratio",
    tier="T3",
    doc="N-gram repetition quality filter (T3.4; the duplicate-n-gram "
    "fraction family of Gopher/RefinedWeb-style corpus filters, Rae "
    "et al. 2021 §A1.1): per doc, the fraction of word 2-grams and "
    "3-grams that are repeats of an earlier occurrence, plus the "
    "most-frequent-word share — high values mark boilerplate/spam. "
    "All ratios exact integer ppm. Scale shape: every measure is "
    "row-local array algebra (grams via sequence+transform over one "
    "split; the top-word count is a run-length fold over array_sort, "
    "O(n log n) per doc, NOT an explode+groupBy shuffle) — zero "
    "exchanges except the final presentation sort.",
    oracle="""
    WITH x AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), g AS (
      SELECT doc_id, t,
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        ELSE [] END AS g2,
        CASE WHEN len(t) >= 3 THEN
          list_transform(range(1, len(t) - 1),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        ELSE [] END AS g3
      FROM x
    ), top AS (
      SELECT doc_id, max(c) AS top_word_n FROM (
        SELECT doc_id, count(*) AS c FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ) GROUP BY doc_id, w
      ) GROUP BY doc_id
    )
    SELECT g.doc_id,
      CAST(len(t) AS BIGINT) AS n_words,
      CAST(len(g2) AS BIGINT) AS n_2grams,
      CAST((len(g2) - len(list_distinct(g2))) * 1000000
           // greatest(len(g2), 1) AS BIGINT) AS dup2_ppm,
      CAST((len(g3) - len(list_distinct(g3))) * 1000000
           // greatest(len(g3), 1) AS BIGINT) AS dup3_ppm,
      CAST(top.top_word_n * 1000000 // greatest(len(t), 1) AS BIGINT)
        AS top_word_ppm
    FROM g JOIN top ON g.doc_id = top.doc_id
    ORDER BY g.doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", spread=True)
    return (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .withColumn(
            "g2",
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                " ELSE array() END"
            ),
        )
        .withColumn(
            "g3",
            F.expr(
                "CASE WHEN size(t) >= 3 THEN transform(sequence(1, size(t) - 2),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1),"
                " ' ', element_at(t, i + 2))) ELSE array() END"
            ),
        )
        .withColumn(
            # run-length fold over the sorted array: the per-doc mode
            # count without an explode+groupBy shuffle
            "top_word_n",
            F.expr(
                "aggregate(array_sort(t),"
                " named_struct('prev', CAST(NULL AS STRING),"
                "              'run', 0L, 'best', 0L),"
                " (s, w) -> named_struct("
                "   'prev', w,"
                "   'run', IF(s.prev <=> w, s.run + 1L, 1L),"
                "   'best', greatest(s.best, IF(s.prev <=> w, s.run + 1L, 1L))),"
                " s -> s.best)"
            ),
        )
        .select(
            "doc_id",
            F.expr("CAST(size(t) AS BIGINT)").alias("n_words"),
            F.expr("CAST(size(g2) AS BIGINT)").alias("n_2grams"),
            F.expr(
                "CAST((size(g2) - size(array_distinct(g2))) * 1000000"
                " div greatest(size(g2), 1) AS BIGINT)"
            ).alias("dup2_ppm"),
            F.expr(
                "CAST((size(g3) - size(array_distinct(g3))) * 1000000"
                " div greatest(size(g3), 1) AS BIGINT)"
            ).alias("dup3_ppm"),
            F.expr(
                "CAST(top_word_n * 1000000 div greatest(size(t), 1) AS BIGINT)"
            ).alias("top_word_ppm"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_gopher_quality",
    tier="T3",
    doc="Gopher-rule document quality gates (T3.4; Rae et al. 2021 "
    "§A1.1, the public rule set behind MassiveText filtering): word "
    "count in [50, 100000], mean word length in [3, 10], >= 2 "
    "stopword hits, >= 80% of words containing a letter — per-gate "
    "booleans plus the conjunction, all thresholds applied to exact "
    "integer ppm so both engines agree bit-for-bit. Row-local: one "
    "split, four array folds, no exchange before the final sort.",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), m AS (
      SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(t, w -> length(w))) AS BIGINT) AS sum_len,
        CAST(len(list_filter(t, w -> list_contains([{_STOP_SQL}], w)))
             AS BIGINT) AS stop_hits,
        CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
             AS BIGINT) AS alpha_words
      FROM x
    )
    SELECT doc_id, n_words,
      sum_len * 1000000 // greatest(n_words, 1) AS mean_word_len_e6,
      stop_hits,
      alpha_words * 1000000 // greatest(n_words, 1) AS alpha_word_ppm,
      CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
        AS gate_word_count,
      CASE WHEN sum_len * 1000000 // greatest(n_words, 1)
                BETWEEN 3000000 AND 10000000 THEN 1 ELSE 0 END
        AS gate_mean_len,
      CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS gate_stopwords,
      CASE WHEN alpha_words * 1000000 // greatest(n_words, 1) >= 800000
           THEN 1 ELSE 0 END AS gate_alpha,
      CASE WHEN n_words BETWEEN 50 AND 100000
            AND sum_len * 1000000 // greatest(n_words, 1)
                BETWEEN 3000000 AND 10000000
            AND stop_hits >= 2
            AND alpha_words * 1000000 // greatest(n_words, 1) >= 800000
           THEN 1 ELSE 0 END AS passes_gopher
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stop_arr = ", ".join(f"'{w}'" for w in X.STOPWORDS)
    m = d.select(
        "doc_id",
        F.split("text", " ").alias("t"),
    ).select(
        "doc_id",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_words"),
        F.expr(
            "aggregate(t, 0L, (acc, w) -> acc + length(w))"
        ).alias("sum_len"),
        F.expr(
            f"CAST(size(filter(t, w -> array_contains(array({stop_arr}), w)))"
            " AS BIGINT)"
        ).alias("stop_hits"),
        F.expr(
            "CAST(size(filter(t, w -> w rlike '[a-z]')) AS BIGINT)"
        ).alias("alpha_words"),
    )
    mean_len = "sum_len * 1000000 div greatest(n_words, 1)"
    alpha_ppm = "alpha_words * 1000000 div greatest(n_words, 1)"
    return m.select(
        "doc_id",
        "n_words",
        F.expr(mean_len).alias("mean_word_len_e6"),
        "stop_hits",
        F.expr(alpha_ppm).alias("alpha_word_ppm"),
        F.expr(
            "CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END"
        ).alias("gate_word_count"),
        F.expr(
            f"CASE WHEN {mean_len} BETWEEN 3000000 AND 10000000"
            " THEN 1 ELSE 0 END"
        ).alias("gate_mean_len"),
        F.expr("CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END").alias(
            "gate_stopwords"
        ),
        F.expr(
            f"CASE WHEN {alpha_ppm} >= 800000 THEN 1 ELSE 0 END"
        ).alias("gate_alpha"),
        F.expr(
            f"CASE WHEN n_words BETWEEN 50 AND 100000"
            f" AND {mean_len} BETWEEN 3000000 AND 10000000"
            f" AND stop_hits >= 2 AND {alpha_ppm} >= 800000"
            " THEN 1 ELSE 0 END"
        ).alias("passes_gopher"),
    ).orderBy("doc_id")


@query(
    "text_gopher_symbol_lines",
    tier="T3",
    doc="Gopher symbol/line-shape gates (T3.4; Rae et al. 2021 §A1.1, "
    "completing the rule set the r11 word-grain gates started): "
    "symbol-to-word ratio for '#' and ellipsis (each must be <= 0.1), "
    "fraction of lines starting with a bullet (<= 90%) and ending "
    "with an ellipsis (<= 30%). All ratios exact integer ppm so both "
    "engines agree bit-for-bit; symbol occurrence counts use "
    "length-delta over replace() (identical non-overlapping greedy "
    "semantics in Spark and DuckDB — no regex engine drift). The "
    "driver's synthetic documents are single-line and symbol-free, so "
    "values are degenerate-but-exact there; non-degenerate behavior "
    "is gated by the multi-line fixture test in tests/test_plans.py. "
    "Row-local: one split + array folds, zero exchanges before the "
    "presentation sort.",
    oracle=r"""
    WITH x AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
          AS n_hash,
        CAST((length(text) - length(replace(text, '...', ''))) // 3
             + length(text) - length(replace(text, '…', '')) AS BIGINT)
          AS n_ellipsis,
        string_split(text, chr(10)) AS lines
      FROM documents
    ), m AS (
      SELECT doc_id, n_words, n_hash, n_ellipsis,
        CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(list_filter(lines,
               l -> regexp_matches(l, '^\s*[•*-]'))) AS BIGINT)
          AS bullet_lines,
        CAST(len(list_filter(lines,
               l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS BIGINT)
          AS ellipsis_lines
      FROM x
    )
    SELECT doc_id, n_words,
      n_hash * 1000000 // greatest(n_words, 1) AS hash_word_ppm,
      n_ellipsis * 1000000 // greatest(n_words, 1) AS ellipsis_word_ppm,
      n_lines,
      bullet_lines * 1000000 // greatest(n_lines, 1) AS bullet_line_ppm,
      ellipsis_lines * 1000000 // greatest(n_lines, 1) AS ellipsis_line_ppm,
      CASE WHEN n_hash * 1000000 // greatest(n_words, 1) <= 100000
            AND n_ellipsis * 1000000 // greatest(n_words, 1) <= 100000
           THEN 1 ELSE 0 END AS gate_symbol,
      CASE WHEN bullet_lines * 1000000 // greatest(n_lines, 1) <= 900000
           THEN 1 ELSE 0 END AS gate_bullet,
      CASE WHEN ellipsis_lines * 1000000 // greatest(n_lines, 1) <= 300000
           THEN 1 ELSE 0 END AS gate_ellipsis_lines,
      CASE WHEN n_hash * 1000000 // greatest(n_words, 1) <= 100000
            AND n_ellipsis * 1000000 // greatest(n_words, 1) <= 100000
            AND bullet_lines * 1000000 // greatest(n_lines, 1) <= 900000
            AND ellipsis_lines * 1000000 // greatest(n_lines, 1) <= 300000
           THEN 1 ELSE 0 END AS passes_symbol_gates
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_symbol_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_words"),
        F.expr(
            "CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)"
        ).alias("n_hash"),
        F.expr(
            "CAST((length(text) - length(replace(text, '...', ''))) div 3"
            " + length(text) - length(replace(text, '…', '')) AS BIGINT)"
        ).alias("n_ellipsis"),
        F.split("text", "\n").alias("lines"),
    ).select(
        "doc_id",
        "n_words",
        "n_hash",
        "n_ellipsis",
        F.expr("CAST(size(lines) AS BIGINT)").alias("n_lines"),
        F.expr(
            r"CAST(size(filter(lines, l -> l rlike '^\\s*[•*-]')) AS BIGINT)"
        ).alias("bullet_lines"),
        F.expr(
            r"CAST(size(filter(lines, l -> l rlike '(\\.\\.\\.|…)\\s*$'))"
            " AS BIGINT)"
        ).alias("ellipsis_lines"),
    )
    hash_ppm = "n_hash * 1000000 div greatest(n_words, 1)"
    ell_ppm = "n_ellipsis * 1000000 div greatest(n_words, 1)"
    bullet_ppm = "bullet_lines * 1000000 div greatest(n_lines, 1)"
    ell_line_ppm = "ellipsis_lines * 1000000 div greatest(n_lines, 1)"
    return m.select(
        "doc_id",
        "n_words",
        F.expr(hash_ppm).alias("hash_word_ppm"),
        F.expr(ell_ppm).alias("ellipsis_word_ppm"),
        "n_lines",
        F.expr(bullet_ppm).alias("bullet_line_ppm"),
        F.expr(ell_line_ppm).alias("ellipsis_line_ppm"),
        F.expr(
            f"CASE WHEN {hash_ppm} <= 100000 AND {ell_ppm} <= 100000"
            " THEN 1 ELSE 0 END"
        ).alias("gate_symbol"),
        F.expr(
            f"CASE WHEN {bullet_ppm} <= 900000 THEN 1 ELSE 0 END"
        ).alias("gate_bullet"),
        F.expr(
            f"CASE WHEN {ell_line_ppm} <= 300000 THEN 1 ELSE 0 END"
        ).alias("gate_ellipsis_lines"),
        F.expr(
            f"CASE WHEN {hash_ppm} <= 100000 AND {ell_ppm} <= 100000"
            f" AND {bullet_ppm} <= 900000 AND {ell_line_ppm} <= 300000"
            " THEN 1 ELSE 0 END"
        ).alias("passes_symbol_gates"),
    ).orderBy("doc_id")


@query(
    "text_gopher_dup_lines",
    tier="T3",
    doc="Gopher duplicate line/paragraph gates (T3.4; Rae et al. 2021 "
    "§A1.1 — the LINE-grain duplication family, complementing the "
    "n-gram grain of text_repetition_ratio): fraction of duplicate "
    "lines (<= 30%) and paragraphs (<= 30%) by count, and by "
    "CHARACTER mass (<= 20% each) — dup chars = total member chars "
    "minus first-occurrence chars, a pure array-algebra identity "
    "(sum(len) - sum(len over array_distinct)). Exact integer ppm. "
    "Driver documents are single-line (degenerate-but-exact); the "
    "multi-line fixture test in tests/test_plans.py gates real "
    "behavior. Row-local: two splits + folds, zero exchanges before "
    "the presentation sort.",
    oracle=r"""
    WITH x AS (
      SELECT doc_id,
        string_split(text, chr(10)) AS lines,
        string_split(text, chr(10) || chr(10)) AS paras
      FROM documents
    ), m AS (
      SELECT doc_id,
        CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(paras) AS BIGINT) AS n_paras,
        CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS dup_lines,
        CAST(len(paras) - len(list_distinct(paras)) AS BIGINT) AS dup_paras,
        CAST(list_sum(list_transform(lines, l -> length(l))) AS BIGINT)
          AS line_chars,
        CAST(list_sum(list_transform(paras, p -> length(p))) AS BIGINT)
          AS para_chars,
        CAST(list_sum(list_transform(lines, l -> length(l)))
             - list_sum(list_transform(list_distinct(lines),
                                       l -> length(l))) AS BIGINT)
          AS dup_line_chars,
        CAST(list_sum(list_transform(paras, p -> length(p)))
             - list_sum(list_transform(list_distinct(paras),
                                       p -> length(p))) AS BIGINT)
          AS dup_para_chars
      FROM x
    )
    SELECT doc_id, n_lines, n_paras,
      dup_lines * 1000000 // greatest(n_lines, 1) AS dup_line_ppm,
      dup_paras * 1000000 // greatest(n_paras, 1) AS dup_para_ppm,
      dup_line_chars * 1000000 // greatest(line_chars, 1)
        AS dup_line_char_ppm,
      dup_para_chars * 1000000 // greatest(para_chars, 1)
        AS dup_para_char_ppm,
      CASE WHEN dup_lines * 1000000 // greatest(n_lines, 1) <= 300000
            AND dup_paras * 1000000 // greatest(n_paras, 1) <= 300000
            AND dup_line_chars * 1000000 // greatest(line_chars, 1) <= 200000
            AND dup_para_chars * 1000000 // greatest(para_chars, 1) <= 200000
           THEN 1 ELSE 0 END AS passes_dup_gates
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.split("text", "\n").alias("lines"),
        F.split("text", "\n\n").alias("paras"),
    ).select(
        "doc_id",
        F.expr("CAST(size(lines) AS BIGINT)").alias("n_lines"),
        F.expr("CAST(size(paras) AS BIGINT)").alias("n_paras"),
        F.expr(
            "CAST(size(lines) - size(array_distinct(lines)) AS BIGINT)"
        ).alias("dup_lines"),
        F.expr(
            "CAST(size(paras) - size(array_distinct(paras)) AS BIGINT)"
        ).alias("dup_paras"),
        F.expr(
            "aggregate(lines, 0L, (a, l) -> a + length(l))"
        ).alias("line_chars"),
        F.expr(
            "aggregate(paras, 0L, (a, p) -> a + length(p))"
        ).alias("para_chars"),
        F.expr(
            "aggregate(lines, 0L, (a, l) -> a + length(l))"
            " - aggregate(array_distinct(lines), 0L, (a, l) -> a + length(l))"
        ).alias("dup_line_chars"),
        F.expr(
            "aggregate(paras, 0L, (a, p) -> a + length(p))"
            " - aggregate(array_distinct(paras), 0L, (a, p) -> a + length(p))"
        ).alias("dup_para_chars"),
    )
    dl = "dup_lines * 1000000 div greatest(n_lines, 1)"
    dp = "dup_paras * 1000000 div greatest(n_paras, 1)"
    dlc = "dup_line_chars * 1000000 div greatest(line_chars, 1)"
    dpc = "dup_para_chars * 1000000 div greatest(para_chars, 1)"
    return m.select(
        "doc_id",
        "n_lines",
        "n_paras",
        F.expr(dl).alias("dup_line_ppm"),
        F.expr(dp).alias("dup_para_ppm"),
        F.expr(dlc).alias("dup_line_char_ppm"),
        F.expr(dpc).alias("dup_para_char_ppm"),
        F.expr(
            f"CASE WHEN {dl} <= 300000 AND {dp} <= 300000"
            f" AND {dlc} <= 200000 AND {dpc} <= 200000"
            " THEN 1 ELSE 0 END"
        ).alias("passes_dup_gates"),
    ).orderBy("doc_id")
