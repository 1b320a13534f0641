"""Regression tests for the round-1 ADVICE findings:

1. corpus-kind index + attach_doc_meta must not crash (null-filled
   conv_id/turn_idx instead) — the `cli query` path hardcodes
   attach_doc_meta=True.
2. A single-document corpus has max_doc_id=0, which must not be treated
   as "missing"; sharded query mode must still return the hit.
3. A planted mass-duplicate cluster must yield its FULL near-dup pair
   set (the old LSH bucket cap silently truncated at 64 docs).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.query import run_queries
from web_search_engine_ray.spec import EngineConfig

CFG = EngineConfig(hot_sample_docs=1000)


def _corpus_index(tmp_path, texts):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "idx")
    build_index(src, out, CFG, input_kind="corpus")
    return out


def test_corpus_index_attach_meta_null_filled(ray_session, tmp_path):
    out = _corpus_index(tmp_path, ["alpha beta gamma", "delta alpha"])
    q = pa.table({"query_id": pa.array([0], pa.int64()),
                  "query": pa.array(["alpha"], pa.string())})
    res = run_queries(out, q, k=5, mode="wand", attach_doc_meta=True)
    assert res.num_rows == 2
    assert "conv_id" in res.schema.names and "turn_idx" in res.schema.names
    assert res.column("conv_id").null_count == res.num_rows
    assert res.column("turn_idx").type == pa.int32()


def test_single_doc_corpus_sharded_mode(ray_session, tmp_path):
    out = _corpus_index(tmp_path, ["only one document here"])
    from web_search_engine_ray.state.manifest import read_stats
    assert read_stats(out)["max_doc_id"] == 0
    q = pa.table({"query_id": pa.array([0], pa.int64()),
                  "query": pa.array(["document"], pa.string())})
    for mode in ("wand", "sharded"):
        res = run_queries(out, q, k=5, mode=mode)
        assert res.num_rows == 1, mode
        assert res.column("doc_id").to_pylist() == [0], mode


def test_mass_duplicate_cluster_full_pair_set(ray_session, tmp_path):
    """100 exact copies (> the old 64-doc bucket cap) + distractors:
    all 100*99/2 within-cluster pairs must come back."""
    from web_search_engine_ray.pipelines.analysis import near_dup_pairs
    boiler = ("breaking news article boilerplate footer subscribe now "
              "terms of service privacy policy contact us about careers")
    texts = [boiler] * 100
    texts += [f"distinct doc {i} talks about subject {i * 3} quite "
              f"differently each time {i}" for i in range(20)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    src = str(tmp_path / "dup.parquet")
    pq.write_table(tbl, src)
    pairs = near_dup_pairs(ray.data.from_arrow(tbl), src, threshold=0.8) \
        .to_pandas()
    cluster = pairs[(pairs.doc_id_a < 100) & (pairs.doc_id_b < 100)]
    assert len(cluster) == 100 * 99 // 2
    assert (cluster.jaccard == 1.0).all()
    assert len(pairs) == len(cluster)           # distractors never pair


# --- round-4 ADVICE regressions -------------------------------------------


def test_hopping_partial_high_key_cardinality_no_overflow(ray_session):
    """Round-4 ADVICE: the per-batch (window, key) pairing must not wrap
    int64 when window starts are modern-epoch microseconds and per-batch
    key cardinality is large (the old wk * (n_keys + 1) encoding wrapped
    above ~5e3 keys, silently corrupting group sums)."""
    import pyarrow.compute as pc

    from web_search_engine_ray.pipelines.temporal import hopping_window_agg

    n_keys = 6000
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.full(n_keys, base, np.int64)
    tbl = pa.table({
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "k": pa.array([f"key{i:05d}" for i in range(n_keys)], pa.string()),
        "v": pa.array(np.arange(n_keys, dtype=np.float64)),
    })
    # one batch through the combiner: batch_size=None would still split
    # by block, so call the op end-to-end with a single-block dataset
    out = hopping_window_agg(
        ray.data.from_arrow(tbl).repartition(1),
        ts_col="ts", key="k", val_col="v",
        window_us=3_600_000_000, slide_us=3_600_000_000)
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    got = got.sort_by("k")
    assert got.num_rows == n_keys                 # one row per (window, key)
    assert got.column("sum_value").to_pylist() == list(
        np.arange(n_keys, dtype=np.float64))
    assert pc.min(got.column("window_start")).as_py() == \
        pc.max(got.column("window_start")).as_py()


def test_asof_tie_col_deterministic(ray_session):
    """Duplicate (key, ts) right rows: tie_col picks the max-value row
    deterministically regardless of input partition order."""
    from web_search_engine_ray.pipelines.temporal import asof_join

    left = pa.table({
        "uid": pa.array([1, 2], pa.int64()),
        "ts": pa.array(np.array([2_000, 2_000], "datetime64[us]"),
                       pa.timestamp("us")),
        "lval": pa.array([0.5, 0.7]),
    })
    # uid 1 has THREE right rows at the identical qualifying ts
    right = pa.table({
        "uid": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array(np.array([1_000, 1_000, 1_000, 1_500],
                                "datetime64[us]"), pa.timestamp("us")),
        "rval": pa.array([3.0, 9.0, 5.0, 4.0]),
    })
    for nparts in (1, 2, 3):
        got = pa.concat_tables(list(asof_join(
            ray.data.from_arrow(left).repartition(nparts),
            ray.data.from_arrow(right).repartition(nparts),
            key="uid", ts_col="ts", value_cols=["rval"],
            tie_col="rval").iter_batches(batch_format="pyarrow")),
            promote_options="default").sort_by("uid")
        assert got.column("rval").to_pylist() == [9.0, 4.0]


def test_anti_join_keeps_null_key_left_rows(ray_session):
    """Round-4 ADVICE: a NULL join key never matches under EXISTS
    semantics — anti keeps the row, semi drops it (the old mask left
    nulls in place and Table.filter dropped them on BOTH paths)."""
    from web_search_engine_ray.functions.grouping import anti_join, semi_join

    left = pa.table({"k": pa.array([1, 2, None, 4], pa.int64()),
                     "v": pa.array(["a", "b", "c", "d"], pa.string())})
    right = pa.table({"k": pa.array([2, None], pa.int64())})
    anti = pa.concat_tables(list(anti_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k").iter_batches(batch_format="pyarrow"))).sort_by("v")
    assert anti.column("v").to_pylist() == ["a", "c", "d"]
    semi = pa.concat_tables(list(semi_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k").iter_batches(batch_format="pyarrow"))).sort_by("v")
    assert semi.column("v").to_pylist() == ["b"]


def test_ngram_jaccard_pairs_size_guard(ray_session):
    """The O(N^2) oracle cross-check refuses oversized corpora loudly."""
    import pytest

    from web_search_engine_ray.pipelines.analysis import ngram_jaccard_pairs

    tbl = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                    "text": pa.array([f"alpha beta gamma delta {i}"
                                      for i in range(30)], pa.string())})
    with pytest.raises(ValueError, match="max_docs"):
        ngram_jaccard_pairs(ray.data.from_arrow(tbl), max_docs=10)
    # under the cap it still runs; each pair shares 2 of its 4
    # distinct shingles -> jaccard exactly 0.5 -> all C(30,2) qualify
    out = ngram_jaccard_pairs(ray.data.from_arrow(tbl), max_docs=50)
    assert out.num_rows == 30 * 29 // 2
