"""Unit: pinned tokenizer + BM25 kernel + stable hashing (SURVEY.md §5.1)."""

import math

import numpy as np

from web_search_engine_ray import spec
from web_search_engine_ray.functions.tokenize import batch_postings, doc_lengths


def test_tokenizer_golden():
    cases = {
        "Hello, World!": ["hello", "world"],
        "a1 B2 c3": ["a1", "b2", "c3"],
        "": [],
        "  --  ": [],
        "don't stop-me now": ["don", "t", "stop", "me", "now"],
        "MiXeD CaSe 42x": ["mixed", "case", "42x"],
        "tabs\tand\nnewlines": ["tabs", "and", "newlines"],
    }
    for text, want in cases.items():
        assert spec.tokenize(text) == want


def test_bm25_hand_computed():
    # 3-doc toy corpus: d0="a a b", d1="a c", d2="b b b c"
    # N=3, dl=[3,2,4], avgdl=3; df: a=2, b=2, c=2
    N, avgdl = 3.0, 3.0
    idf_a = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    assert spec.idf(N, 2) == idf_a
    # score("a", d0): tf=2, dl=3 -> idf_a * 2/(2 + 1.2*(0.25 + 0.75*1))
    want = idf_a * 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 3.0 / avgdl))
    assert spec.bm25_term(2, 3, avgdl, idf_a) == want


def test_stable_hash_deterministic():
    # sha1-based: fixed forever, process-independent (never Python hash())
    import hashlib
    want = int.from_bytes(hashlib.sha1(b"hello").digest()[:8], "big")
    assert spec.stable_hash64("hello") == want
    assert spec.term_bucket("hello", 64) == want % 64
    assert spec.stable_hash64("a") != spec.stable_hash64("b")
    assert spec.derive_seed(42, 0) != spec.derive_seed(42, 1)


def test_batch_postings_and_lengths():
    doc_ids = np.array([10, 11, 12], dtype=np.int64)
    texts = ["a a b", "", "B c a"]
    d, terms, tf, dl = batch_postings(doc_ids, texts)
    rows = sorted(zip(d.tolist(), terms, tf.tolist(), dl.tolist()))
    assert rows == [(10, "a", 2, 3), (10, "b", 1, 3),
                    (12, "a", 1, 3), (12, "b", 1, 3), (12, "c", 1, 3)]
    assert doc_lengths(texts).tolist() == [3, 0, 3]


def test_config_hash_changes():
    a = spec.EngineConfig()
    b = spec.EngineConfig(num_buckets=32)
    assert a.config_hash() != b.config_hash()
    assert a.config_hash() == spec.EngineConfig().config_hash()
