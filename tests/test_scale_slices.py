"""Invariants of the scale-slice generators (scripts/gen_scale_slice.py).

The weak-scaling curves (SCALE.md §31/§33) are only meaningful if the
replicas are STRUCTURE-PRESERVING — these tests pin the two custom
replicators' contracts so a future edit can't silently turn the curve
into a duplicate-blowup measurement:

* documents: the per-replica Caesar bijection preserves every
  within-replica shingle-set relation exactly (bijections preserve
  set intersections) while replica shingle spaces stay disjoint.
* embeddings: the per-replica permutation+sign isometry preserves
  within-replica QUANTIZED inner products exactly (the multiset of
  int products is permutation-invariant under exact integer sums)
  while replicas decorrelate.

No SparkSession needed — pure pyarrow/numpy, so the file runs in the
fast tier of the suite.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gen():
    spec = importlib.util.spec_from_file_location(
        "gen_scale_slice", os.path.join(_REPO, "scripts", "gen_scale_slice.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _shingles(text: str, n: int = 5) -> set[str]:
    return {text[i : i + n] for i in range(max(len(text) - n + 1, 1))}


def _jacc(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 1.0


def test_caesar_replication_preserves_shingle_relations(gen, tmp_path):
    # use the smallest driver slice as the source to keep this fast
    gen.SRC = "/root/testdata/sf0.001"
    n = gen._replicate_documents(3, str(tmp_path))
    t = pq.read_table(os.path.join(str(tmp_path), "documents.parquet"))
    src = pq.read_table(os.path.join(gen.SRC, "documents.parquet"))
    n0 = src.num_rows
    assert n == 3 * n0
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    # key offsets are disjoint
    assert len(set(ids)) == n
    # bijection: within-replica Jaccard of the first few doc pairs is
    # IDENTICAL across replicas
    for r in (1, 2):
        off = r * n0
        for i, j in [(0, 1), (1, 2), (0, 3)]:
            a0, b0 = _shingles(texts[i]), _shingles(texts[j])
            ar, br = _shingles(texts[off + i]), _shingles(texts[off + j])
            assert _jacc(a0, b0) == _jacc(ar, br)
            # lengths preserved (Caesar is 1:1 on characters)
            assert len(texts[i]) == len(texts[off + i])
    # replica shingle spaces are disjoint (sampled)
    s0 = _shingles(texts[0]) | _shingles(texts[1])
    s1 = _shingles(texts[n0]) | _shingles(texts[n0 + 1])
    assert not (s0 & s1)


def test_embedding_replication_is_an_exact_quantized_isometry(gen, tmp_path):
    gen.SRC = "/root/testdata/sf0.001"
    n = gen._replicate_embeddings(2, str(tmp_path))
    t = pq.read_table(os.path.join(str(tmp_path), "embeddings.parquet"))
    n0 = n // 2
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    # the catalog's exact kernels run on the 1e-6 integer grid — the
    # isometry must hold EXACTLY there (permuting terms of an exact
    # integer sum cannot change it)
    q = np.round(emb.astype(np.float64) * 1_000_000).astype(np.int64)
    a, b = q[:n0], q[n0:]
    sample = [0, 1, 2, 5, 7]
    for i in sample:
        for j in sample:
            assert a[i] @ a[j] == b[i] @ b[j]
    # replicas decorrelate: the replica image is not the same vector
    assert not np.array_equal(a[0], b[0])
    # vec_id offsets disjoint
    ids = t.column("vec_id").to_pylist()
    assert len(set(ids)) == n


def test_zipf_documents_deterministic(gen, tmp_path):
    p1 = gen.gen_zipf_documents(str(tmp_path / "a"), n_docs=200, vocab=2_000,
                                neardup_pairs=10)
    p2 = gen.gen_zipf_documents(str(tmp_path / "b"), n_docs=200, vocab=2_000,
                                neardup_pairs=10)
    t1, t2 = pq.read_table(p1), pq.read_table(p2)
    assert t1.equals(t2)
    texts = t1.column("text").to_pylist()
    # the planted near-dups really are near-dups on the 5-gram grid
    for i in range(10):
        planted = texts[200 - 10 + i]
        assert _jacc(_shingles(planted), _shingles(texts[i])) >= 0.8


def test_broadcast_threshold_parses_all_config_forms():
    sys.path.insert(0, _REPO)
    from data_warehouse_opensky_spark.plans.graph import (
        _broadcast_threshold_bytes,
    )

    class _Conf:
        def __init__(self, v):
            self._v = v

        def get(self, _k, _d=None):
            return self._v

    class _S:
        def __init__(self, v):
            self.conf = _Conf(v)

    assert _broadcast_threshold_bytes(_S("10485760")) == 10 * (1 << 20)
    assert _broadcast_threshold_bytes(_S("10485760b")) == 10 * (1 << 20)
    assert _broadcast_threshold_bytes(_S("10MB")) == 10 * (1 << 20)
    assert _broadcast_threshold_bytes(_S("10m")) == 10 * (1 << 20)
    assert _broadcast_threshold_bytes(_S("1g")) == 1 << 30
    assert _broadcast_threshold_bytes(_S("-1")) == -1
    # full Spark byte-suffix alphabet incl. petabytes (ADVICE r8: a
    # legitimately set '1p' must parse, not crash plan construction)
    assert _broadcast_threshold_bytes(_S("2t")) == 2 * (1 << 40)
    assert _broadcast_threshold_bytes(_S("1p")) == 1 << 50
    assert _broadcast_threshold_bytes(_S("1PB")) == 1 << 50
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _broadcast_threshold_bytes(_S("10 parsecs"))
