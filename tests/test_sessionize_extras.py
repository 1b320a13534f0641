"""Sessionize, exact n-gram Jaccard, embedding near-dup."""

import numpy as np
import pyarrow as pa
import ray


def test_sessionize_gaps(ray_session):
    from web_search_engine_ray.pipelines.sessionize import sessionize
    base = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)
    minute = 60 * 1_000_000
    rows = []
    # user 1: 3 events in one session, then a 2h gap, then 2 more
    for m in (0, 5, 10, 130, 135):
        rows.append((1, base + m * minute))
    # user 2: single event
    rows.append((2, base))
    # user 3: every event 31 min apart -> every event its own session
    for m in (0, 31, 62, 93):
        rows.append((3, base + m * minute))
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
    })
    out = sessionize(ray.data.from_arrow(tbl)).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "max_session_events"] == 3
    assert out.loc[2, "n_sessions"] == 1
    assert out.loc[3, "n_sessions"] == 4
    assert out.loc[3, "max_session_events"] == 1


def test_ngram_jaccard_exact(ray_session):
    from web_search_engine_ray.pipelines.analysis import ngram_jaccard_pairs
    texts = ["a b c d e f", "a b c d e f", "a b c d x y", "q w e r t y"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = ngram_jaccard_pairs(ray.data.from_arrow(tbl), k=3,
                              threshold=0.2).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(out["doc_id_a"], out["doc_id_b"], out["jaccard"])}
    assert got[(0, 1)] == 1.0
    # docs 0 and 2 share shingles 'a b c', 'b c d' of 4 each -> 2/6
    assert abs(got[(0, 2)] - 2 / 6) < 1e-6  # jaccard rounded to 6dp
    assert (3 not in set(out["doc_id_a"]) and 3 not in set(out["doc_id_b"]))


def test_embedding_dup_pairs(ray_session):
    from web_search_engine_ray.pipelines.analysis import embedding_dup_pairs
    rng = np.random.default_rng(9)
    base = rng.normal(size=(10, 8)).astype(np.float32)
    near = base[0] + rng.normal(scale=0.01, size=8).astype(np.float32)
    mat = np.vstack([base, near[None, :]])
    tbl = pa.table({"vec_id": pa.array(range(11), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in mat],
                                          pa.list_(pa.float32()))})
    out = embedding_dup_pairs(ray.data.from_arrow(tbl),
                              threshold=0.99).to_pandas()
    assert list(zip(out["vec_id_a"], out["vec_id_b"])) == [(0, 10)]
    assert out["sim"].iloc[0] > 0.99
