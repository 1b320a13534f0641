"""Regression tests for the round-1 ADVICE findings:

1. corpus-kind index + attach_doc_meta must not crash (null-filled
   conv_id/turn_idx instead) — the `cli query` path hardcodes
   attach_doc_meta=True.
2. A single-document corpus has max_doc_id=0, which must not be treated
   as "missing"; sharded query mode must still return the hit.
3. A planted mass-duplicate cluster must yield its FULL near-dup pair
   set (the old LSH bucket cap silently truncated at 64 docs).
"""

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
