"""Edge cases for pipelines/ngrams.py the driver oracle can't isolate:
doc-boundary masking in the bigram combiner, partitioning independence,
PMI total-mass semantics, tf-idf tie-breaks."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.pipelines import ngrams as N


def _ds(texts, blocks=1):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    return ray.data.from_arrow(tbl).repartition(blocks)


def _counts(ds):
    out = {}
    for b in N.bigram_counts(ds).iter_batches(batch_format="pyarrow"):
        for g, c in zip(b.column("bigram").to_pylist(),
                        b.column("n_occ").to_pylist()):
            out[g] = out.get(g, 0) + c
    return out


def test_bigrams_never_cross_doc_boundaries(ray_session):
    # "b a" would only exist if doc 0's tail joined doc 1's head
    got = _counts(_ds(["a b", "a b"]))
    assert got == {"a b": 2}


def test_bigram_counts_partition_independent(ray_session):
    texts = [f"w{i % 5} w{(i + 1) % 5} w{i % 3}" for i in range(200)]
    assert _counts(_ds(texts, 1)) == _counts(_ds(texts, 9))


def test_top_bigrams_tie_break(ray_session):
    tbl = N.top_bigrams(_ds(["z q", "z q", "a b", "a b", "m n"]), k=2)
    assert tbl.column("bigram").to_pylist() == ["a b", "z q"]
    assert tbl.column("n_occ").to_pylist() == [2, 2]


def test_pmi_uses_prefilter_total_mass(ray_session):
    # 10x "a b" (passes min_count), 10x singleton bigrams (filtered out
    # but still part of T2).  T2 = 20, T1 = 40.
    texts = ["a b"] * 10 + [f"c{i} d{i}" for i in range(10)]
    out = N.pmi_bigrams(_ds(texts), min_count=5, k=5)
    assert out.column("bigram").to_pylist() == ["a b"]
    t1, t2 = 40.0, 20.0
    want = round(math.log((10 / t2) / ((10 / t1) * (10 / t1))), 6)
    assert out.column("pmi").to_pylist() == [want]


def test_tfidf_rank_and_tie_break(ray_session):
    # doc 0: 'rare' appears twice (df=1), 'common' once (df=3)
    texts = ["rare rare common", "common x", "common y"]
    out = N.tfidf_keywords(_ds(texts), n_docs=3, k=2)
    d0 = out.filter(pa.compute.equal(out.column("doc_id"), 0))
    assert d0.column("term").to_pylist()[0] == "rare"
    assert d0.column("rank").to_pylist() == [1, 2]
    # ln(3/3) = 0 for 'common' -> score 0; rare = 2*ln(3)
    assert d0.column("score").to_pylist()[0] == round(2 * math.log(3.0), 6)
    # doc 1: x (df=1, score ln 3) outranks common (df=3, score 0)
    d1 = out.filter(pa.compute.equal(out.column("doc_id"), 1))
    assert d1.column("term").to_pylist() == ["x", "common"]


def test_tfidf_equal_score_tie_breaks_by_term(ray_session):
    # doc 0's two terms have identical tf and df -> equal scores;
    # rank order must fall back to term ascending
    out = N.tfidf_keywords(_ds(["b a", "x", "y"]), n_docs=3, k=2)
    d0 = out.filter(pa.compute.equal(out.column("doc_id"), 0))
    assert d0.column("term").to_pylist() == ["a", "b"]


def test_tfidf_empty_and_tokenless_docs(ray_session):
    out = N.tfidf_keywords(_ds(["", "only doc", "!!!"]), n_docs=3, k=3)
    assert set(out.column("doc_id").to_pylist()) == {1}
