"""Unit: varbyte/delta codec + block metadata (SURVEY.md §5.1)."""

import numpy as np
import pytest

from web_search_engine_ray.functions import codec


@pytest.mark.parametrize("seed", range(20))
def test_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    ids = np.unique(rng.integers(0, 10**12, size=n).astype(np.int64))
    tfs = rng.integers(1, 1000, size=len(ids)).astype(np.int64)
    e = codec.encode_postings(ids, tfs)
    d, t = codec.decode_postings(e.doc_bytes, e.tf_bytes, e.n)
    assert (d == ids).all() and (t == tfs).all()


@pytest.mark.parametrize("vals", [
    [0], [0, 1], [2**62], [1, 2**62], list(range(1000)),
    [127], [128], [16383], [16384], [5, 10, 15],
])
def test_roundtrip_edges(vals):
    ids = np.array(vals, dtype=np.int64)
    tfs = np.ones(len(ids), dtype=np.int64)
    e = codec.encode_postings(ids, tfs)
    d, _ = codec.decode_postings(e.doc_bytes, e.tf_bytes, e.n)
    assert (d == ids).all()


def test_block_meta_invariants():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10**9, size=5000).astype(np.int64))
    tfs = rng.integers(1, 99, size=len(ids)).astype(np.int64)
    e = codec.encode_postings(ids, tfs)
    # last_doc strictly increasing; equals true block maxima
    assert (np.diff(e.block_last_doc) > 0).all()
    bstarts = np.arange(0, len(ids), codec.BLOCK_SIZE)
    bends = np.minimum(bstarts + codec.BLOCK_SIZE, len(ids))
    assert (e.block_last_doc == ids[bends - 1]).all()
    true_max = np.maximum.reduceat(tfs, bstarts)
    assert (e.block_max_tf == true_max).all()
    assert e.max_tf == tfs.max()
    # offsets monotone, start at 0
    assert e.block_off_docs[0] == 0 and (np.diff(e.block_off_docs) > 0).all()


def test_concat_runs_byte_identical():
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 10**8, size=4000).astype(np.int64))
    tfs = rng.integers(1, 50, size=len(ids)).astype(np.int64)
    cuts = np.sort(rng.choice(np.arange(1, len(ids)), size=3, replace=False))
    runs = [codec.encode_postings(ids[p], tfs[p])
            for p in np.split(np.arange(len(ids)), cuts)]
    merged = codec.concat_runs(runs)
    whole = codec.encode_postings(ids, tfs)
    assert merged.doc_bytes == whole.doc_bytes
    assert merged.tf_bytes == whole.tf_bytes
    d, t = codec.decode_postings(merged.doc_bytes, merged.tf_bytes, merged.n)
    assert (d == ids).all() and (t == tfs).all()


def test_concat_runs_block_decode():
    """Per-block decode (what WAND does) works across run boundaries."""
    rng = np.random.default_rng(13)
    ids = np.unique(rng.integers(0, 10**7, size=1000).astype(np.int64))
    tfs = np.ones(len(ids), dtype=np.int64)
    half = len(ids) // 2
    merged = codec.concat_runs([
        codec.encode_postings(ids[:half], tfs[:half]),
        codec.encode_postings(ids[half:], tfs[half:])])
    nb = len(merged.block_last_doc)
    out = []
    for bi in range(nb):
        d0 = int(merged.block_off_docs[bi])
        d1 = int(merged.block_off_docs[bi + 1]) if bi + 1 < nb else len(merged.doc_bytes)
        deltas = codec.varbyte_decode(merged.doc_bytes[d0:d1]).astype(np.int64)
        base = int(merged.block_last_doc[bi - 1]) if bi else 0
        out.append(base + np.cumsum(deltas))
    assert (np.concatenate(out) == ids).all()


def test_concat_rejects_overlap():
    a = codec.encode_postings(np.array([1, 5]), np.array([1, 1]))
    b = codec.encode_postings(np.array([5, 9]), np.array([1, 1]))
    with pytest.raises(ValueError):
        codec.concat_runs([a, b])
