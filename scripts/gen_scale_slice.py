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


def _replicate_documents(k: int, dst: str) -> int:
    """k disjoint isomorphic copies of the TEXT corpus. A key offset
    alone would leave texts identical across replicas, and identical
    texts form k-sized duplicate clusters -> O(k^2) near-dup pairs: the
    dedup curve would go super-linear because of the FIXTURE, not the
    plan. Instead each replica maps text through a per-replica letter/
    digit ROTATION (a Caesar bijection on strings): within a replica
    every shingle-set relation (Jaccard, MinHash collision structure,
    SimHash geometry) is preserved EXACTLY (bijections preserve set
    intersections), while across replicas shingle spaces are disjoint
    (every shingle carries a rotated letter or digit; k <= 10 keeps
    both rotations nonzero)."""
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ids = t.column("doc_id")
    span = pc.max(ids).as_py() + 1
    texts = t.column("text").to_pylist()
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    digits = "0123456789"
    reps = []
    for r in range(k):
        rep = t
        if r:
            rot = str.maketrans(
                lower + upper + digits,
                lower[r % 26:] + lower[: r % 26]
                + upper[r % 26:] + upper[: r % 26]
                + digits[r % 10:] + digits[: r % 10],
            )
            rep = rep.set_column(
                rep.schema.get_field_index("doc_id"), "doc_id",
                pc.add(ids, r * span))
            rep = rep.set_column(
                rep.schema.get_field_index("text"), "text",
                pa.array([x.translate(rot) for x in texts], pa.string()))
        reps.append(rep)
    out = pa.concat_tables(reps)
    pq.write_table(out, os.path.join(dst, "documents.parquet"))
    return out.num_rows


def _replicate_embeddings(k: int, dst: str) -> int:
    """k disjoint isomorphic copies of the vector corpus. Verbatim
    vectors would be identical across replicas (k-sized zero-distance
    clusters -> quadratic within-bucket kernels in SemDeDup, duplicated
    ANN neighbor lists); each replica instead applies a per-replica
    coordinate PERMUTATION + SIGN FLIPS — an exact isometry of R^d, so
    within-replica inner products, norms, and distances are preserved
    bit-for-bit (same multiset of float multiplications, reordered)
    while cross-replica vectors decorrelate. Deterministic: one seeded
    generator, replicas consume draws in order."""
    import numpy as np

    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ids = t.column("vec_id")
    span = pc.max(ids).as_py() + 1
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    rng = np.random.default_rng(20260815)
    reps = []
    for r in range(k):
        rep = t
        if r:
            perm = rng.permutation(dim)
            signs = rng.choice(
                np.array([-1.0, 1.0], dtype=np.float32), size=dim)
            e = emb[:, perm] * signs
            rep = rep.set_column(
                rep.schema.get_field_index("vec_id"), "vec_id",
                pc.add(ids, r * span))
            rep = rep.set_column(
                rep.schema.get_field_index("embedding"), "embedding",
                pa.array(list(e), pa.list_(pa.float32())))
        reps.append(rep)
    out = pa.concat_tables(reps)
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"))
    return out.num_rows


#: tables with structure-preserving custom replicators (text / vector
#: payloads need more than a key offset — see each function's doc)
CUSTOM_REPLICATED = {
    "documents": _replicate_documents,
    "embeddings": _replicate_embeddings,
}


#: Single source of truth for the Zipf slice recipe. bench.py compares
#: this dict against the `zipf_params.json` marker written next to the
#: generated parquet and regenerates on any mismatch — editing a
#: parameter here can no longer leave a stale slice on disk silently
#: feeding the bench (ADVICE r7). Bump nothing else: the dict IS the
#: version.
ZIPF_PARAMS = {
    "n_docs": 5_000,
    "words_per_doc": 50,
    "vocab": 50_000,
    "neardup_pairs": 100,
    "seed": 20260815,
}


def gen_zipf_documents(
    dst_dir: str, n_docs: int = ZIPF_PARAMS["n_docs"],
    words_per_doc: int = ZIPF_PARAMS["words_per_doc"],
    vocab: int = ZIPF_PARAMS["vocab"],
    neardup_pairs: int = ZIPF_PARAMS["neardup_pairs"],
    seed: int = ZIPF_PARAMS["seed"],
) -> str:
    """Zipf-vocabulary documents slice (VERDICT r6 #3 / What's-wrong #2).

    dedup_prefix_filter_jaccard is EXCLUDED from the bench on the
    driver's documents table: its ~31-word vocabulary yields ~2k
    distinct char-5-gram shingles, so every doc shares its rarity
    prefix and AllPairs degenerates toward all-pairs — a TEST-DATA
    artifact, not a plan property (real web text has billions of
    distinct shingles). This slice gives the query a fixture in its
    intended regime at the same row scale as sf0.1: 5k docs of 50
    words drawn Zipf(s=1.07) from a 50k-word synthetic vocabulary
    (letter words of length 3-8 — char-5-gram diversity tracks the
    word diversity), plus 100 planted near-dup pairs (last 2 of 50
    words swapped -> 5-gram Jaccard ~0.9) so the verify stage has real
    positives to confirm. Deterministic: one seeded numpy generator.
    Only documents.parquet is written — the query reads nothing else.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = [
        "".join(rng.choice(letters, size=int(rng.integers(3, 9))))
        for _ in range(vocab)
    ]
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = ranks ** -1.07
    p /= p.sum()
    draws = rng.choice(vocab, size=(n_docs, words_per_doc), p=p)
    texts = [" ".join(words[w] for w in row) for row in draws]
    # Planted near-dups: doc (base+i) rewrites doc i's last 2 words.
    for i in range(neardup_pairs):
        src_words = texts[i].split(" ")
        src_words[-2:] = [words[int(w)] for w in rng.choice(vocab, 2, p=p)]
        texts[n_docs - neardup_pairs + i] = " ".join(src_words)
    langs = [["en", "zh", "de", "fr"][i % 4] for i in range(n_docs)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 10}" for i in range(n_docs)],
                               pa.string()),
            "n_chars": pa.array([len(t_) for t_ in texts], pa.int64()),
        }
    )
    os.makedirs(dst_dir, exist_ok=True)
    out = os.path.join(dst_dir, "documents.parquet")
    pq.write_table(t, out)
    import json

    params = {
        "n_docs": n_docs, "words_per_doc": words_per_doc,
        "vocab": vocab, "neardup_pairs": neardup_pairs, "seed": seed,
    }
    with open(os.path.join(dst_dir, "zipf_params.json"), "w") as f:
        json.dump(params, f, sort_keys=True)
    print(f"zipf documents: {n_docs} docs, vocab {vocab} -> {out}")
    return out


ZIPF_DOCS_DIR = os.path.join(DST_ROOT, "zipf_docs_sf0.1")


#: Skewed-prefix slice recipe (VERDICT r9 #1): the adversarial crawl
#: regime for dedup_fuzzy_levenshtein's (length-bucket, 8-char-prefix)
#: blocking — a fixed fraction of docs open with the SAME boilerplate
#: prefix AND land in the SAME 16-char length bucket, so they all fall
#: into ONE block and the pair stage is quadratic in hot_frac·n by
#: construction. What the capped plan must show on this fixture: the
#: block's pair work spreads over ceil(n/cap)·(g+1)/2 reducer cells
#: instead of serializing onto one task.
SKEWED_PARAMS = {
    "hot_frac": 0.3,
    "hot_prefix": "<!DOCTYPE html> ",  # first 8 chars shared exactly
    "hot_len_lo": 96,   # 96..111 -> one //16 length bucket
    "hot_len_hi": 111,
    "planted_neardups": 40,
    "seed": 20260816,
}


def gen_skewed_prefix_documents(dst_dir: str, n_docs: int,
                                params: dict = SKEWED_PARAMS) -> str:
    """documents.parquet where hot_frac of docs share one
    (len bucket, prefix) block; the rest scatter across blocks.
    Planted near-dups (suffix differs in <= 4 chars) give the verify
    stage true positives inside the hot block."""
    import json

    import numpy as np

    rng = np.random.default_rng(params["seed"])
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    n_hot = int(n_docs * params["hot_frac"])
    texts = []
    pre = params["hot_prefix"]
    for i in range(n_hot):
        ln = int(rng.integers(params["hot_len_lo"], params["hot_len_hi"] + 1))
        body = "".join(rng.choice(letters, size=ln - len(pre)))
        texts.append(pre + body)
    for i in range(params["planted_neardups"]):
        # rewrite doc i's last 3 chars -> edit distance <= 3 pair
        t = texts[i]
        texts[n_hot - params["planted_neardups"] + i] = (
            t[: len(t) - 3] + "".join(rng.choice(letters, size=3))
        )
    for i in range(n_docs - n_hot):
        ln = int(rng.integers(20, 200))
        texts.append("".join(rng.choice(letters, size=ln)))
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(
                [f"src{i % 10}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    os.makedirs(dst_dir, exist_ok=True)
    out = os.path.join(dst_dir, "documents.parquet")
    pq.write_table(t, out)
    with open(os.path.join(dst_dir, "skew_params.json"), "w") as f:
        json.dump({**params, "n_docs": n_docs}, f, sort_keys=True)
    print(f"skewed-prefix documents: {n_docs} docs ({n_hot} hot) -> {out}")
    return out


#: sf3 decade (VERDICT r10 #6): one more measured decade for the two
#: fact-scale champions. Targeted — only the tables those two queries
#: read are generated (events for streaming_timeout_sessions; a 30x
#: Zipf documents slice for dedup_prefix_filter_jaccard), so the slice
#: costs ~100 MB, not a full 30x warehouse.
SF3_DIR = os.path.join(DST_ROOT, "sf3")
ZIPF_SF3_DIR = os.path.join(DST_ROOT, "zipf_docs_sf3")
#: Zipf sf3 recipe: 30x docs; vocabulary grows by Heaps' law
#: (V ~ N^0.7 — real crawls add vocabulary sublinearly), so per-token
#: document frequency grows ~2.8x, not 30x, keeping the slice in the
#: query's intended vocabulary>>corpus regime rather than manufacturing
#: a degenerate all-pairs blowup the fixture is specifically NOT about.
ZIPF_SF3_PARAMS = {
    "n_docs": 150_000,          # 30 x 5k
    "words_per_doc": 50,
    "vocab": 500_000,           # 50k x 30^0.7 ~ 540k, rounded
    "neardup_pairs": 3_000,     # 30 x 100
    "seed": 20260816,
}


def gen_sf3() -> None:
    os.makedirs(SF3_DIR, exist_ok=True)
    for tbl in ("events", "lineitem"):
        n = _replicate(tbl, REPLICATED[tbl], 30, SF3_DIR)
        print(f"sf3: {tbl} x30 = {n} rows -> {SF3_DIR}")
    gen_zipf_documents(ZIPF_SF3_DIR, **{
        k: v for k, v in ZIPF_SF3_PARAMS.items()
    })


def main() -> None:
    import sys

    if "--zipf-only" in sys.argv:
        gen_zipf_documents(ZIPF_DOCS_DIR)
        return
    if "--sf3-only" in sys.argv:
        gen_sf3()
        return
    for name, k in SLICES.items():
        dst = os.path.join(DST_ROOT, name)
        os.makedirs(dst, exist_ok=True)
        for tbl in TABLES:
            if tbl in REPLICATED or tbl in CUSTOM_REPLICATED:
                continue
            shutil.copyfile(
                os.path.join(SRC, f"{tbl}.parquet"),
                os.path.join(dst, f"{tbl}.parquet"),
            )
        for tbl, keys in REPLICATED.items():
            n = _replicate(tbl, keys, k, dst)
            print(f"{name}: {tbl} x{k} = {n} rows -> {dst}")
        for tbl, fn in CUSTOM_REPLICATED.items():
            n = fn(k, dst)
            print(f"{name}: {tbl} x{k} = {n} rows -> {dst}")
    gen_zipf_documents(ZIPF_DOCS_DIR)


if __name__ == "__main__":
    main()
