"""Positional sidecar index (pipelines/positional.py): codec roundtrip,
phrase adjacency vs the pinned regex semantics, batching independence
of the build, and the duplicate-doc guard."""

import re
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from web_search_engine_ray.pipelines import positional as P
from web_search_engine_ray.pipelines.curation import phrase_regex
from web_search_engine_ray.spec import tokenize


def _build(tmp_path, texts, ids=None, **kw):
    ids = list(range(len(texts))) if ids is None else ids
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = str(tmp_path / "pos")
    shutil.rmtree(out, ignore_errors=True)
    rows = P.build_positional_index(ds, out, **kw)
    return out, rows


def _rand_corpus(rng, n_docs=120, vocab=12):
    words = [f"w{i}" for i in range(vocab)]
    texts = []
    for _ in range(n_docs):
        n = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(words, n)))
    return texts


def test_positions_roundtrip(ray_session, tmp_path):
    texts = ["b a b b a", "a a a", "c", ""]
    out, _ = _build(tmp_path, texts)
    r = P.PositionalReader(out)
    for term in ("a", "b", "c"):
        doc_ids, npos, pos = r.postings(term)
        off = 0
        for d, k in zip(doc_ids, npos):
            toks = tokenize(texts[d])
            want = [i for i, t in enumerate(toks) if t == term]
            assert pos[off:off + k].tolist() == want
            off += k
    assert r.postings("zzz") is None


def test_phrase_matches_regex_randomized(ray_session, tmp_path):
    """Positional adjacency == the pinned regex semantics on a random
    small-vocab corpus (high repetition -> many near-miss cases)."""
    rng = np.random.default_rng(7)
    texts = _rand_corpus(rng)
    out, _ = _build(tmp_path, texts)
    reader = P.PositionalReader(out)
    for _ in range(40):
        k = int(rng.integers(1, 4))
        phrase = " ".join(rng.choice([f"w{i}" for i in range(12)], k))
        got = sorted(P.phrase_docs(reader, phrase).tolist())
        rx = re.compile(phrase_regex(phrase))
        want = [i for i, t in enumerate(texts) if rx.search(t.lower())]
        assert got == want, phrase


def test_build_batching_independent(ray_session, tmp_path):
    """Same corpus at different block counts -> byte-identical buckets."""
    rng = np.random.default_rng(11)
    texts = _rand_corpus(rng, n_docs=200)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    hashes = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = str(tmp_path / f"pos{blocks}")
        rows = P.build_positional_index(ds, out)
        hashes.append({r["bucket"]: r["sha256"] for r in rows})
    assert hashes[0] == hashes[1] and len(hashes[0]) > 0


def test_repeated_term_phrase(ray_session, tmp_path):
    out, _ = _build(tmp_path, ["go go go", "go stop go", "go"])
    r = P.PositionalReader(out)
    assert P.phrase_docs(r, "go go").tolist() == [0]
    assert P.phrase_docs(r, "go go go").tolist() == [0]
    assert P.phrase_docs(r, "go stop").tolist() == [1]


def test_duplicate_doc_id_rejected(ray_session, tmp_path):
    with pytest.raises(Exception, match="duplicate doc_id"):
        _build(tmp_path, ["same term", "same term"], ids=[5, 5])


def test_phrase_search_pos_table(ray_session, tmp_path):
    out, _ = _build(tmp_path, ["alpha beta", "beta alpha", "alpha beta x"])
    tbl = P.phrase_search_pos(out, [(3, "alpha beta"), (1, "beta alpha"),
                                    (9, "missing term")])
    assert tbl.column("phrase_id").to_pylist() == [1, 3, 3]
    assert tbl.column("doc_id").to_pylist() == [1, 0, 2]
