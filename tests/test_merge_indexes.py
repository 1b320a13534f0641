"""Incremental indexing: merge_indexes(base, delta) must be
result-identical to a full rebuild of the union corpus — BM25 scores
and per-term dictionary stats are docID-labeling-invariant, so the
merged index (delta ids remapped past the base) returns the same
(conv_id, turn_idx, score) sets for every query."""

import numpy as np
import pyarrow.parquet as pq

import pytest

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.pipelines.merge import merge_indexes
from web_search_engine_ray.pipelines.query import run_queries
from web_search_engine_ray.sources.transcripts import (gen_queries,
                                                       gen_transcripts)


@pytest.fixture(scope="module")
def merged_vs_full(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    base_corpus = gen_transcripts(120)                   # convs 0..119
    delta_corpus = gen_transcripts(170).filter(
        lambda r: int(r["conv_id"][1:]) >= 120)
    full_corpus = gen_transcripts(170)
    build_index(base_corpus, str(root / "base"))
    build_index(delta_corpus, str(root / "delta"))
    stats = merge_indexes(str(root / "base"), str(root / "delta"),
                          str(root / "merged"))
    full_stats = build_index(full_corpus, str(root / "full"))
    return root, stats, full_stats


def test_merged_stats_match_full(merged_vs_full):
    _, stats, full_stats = merged_vs_full
    assert stats["n_docs"] == full_stats["n_docs"]
    assert stats["total_tokens"] == full_stats["total_tokens"]
    assert abs(stats["avgdl"] - full_stats["avgdl"]) < 1e-9
    assert stats["dl_min"] == full_stats["dl_min"]


def test_merged_dictionary_matches_full(merged_vs_full):
    root, _, _ = merged_vs_full

    def dict_map(d):
        t = pq.read_table(str(d))
        return {term: (df, cf, mtf) for term, df, cf, mtf in zip(
            t.column("term").to_pylist(), t.column("df").to_pylist(),
            t.column("cf").to_pylist(), t.column("max_tf").to_pylist())}

    m = dict_map(root / "merged" / "dictionary")
    f = dict_map(root / "full" / "dictionary")
    assert m == f


def test_merged_query_results_match_full(merged_vs_full):
    """Top-k per query agrees with the full rebuild on the
    (conv_id, turn_idx, score) level — docIDs differ by construction,
    so k is padded and compared on score-faithful sets."""
    root, _, _ = merged_vs_full
    q = gen_queries()
    a = run_queries(str(root / "merged"), q, k=10,
                    attach_doc_meta=True).to_pandas()
    b = run_queries(str(root / "full"), q, k=10,
                    attach_doc_meta=True).to_pandas()
    for qid in a["query_id"].unique():
        sa = a[a.query_id == qid]
        sb = b[b.query_id == qid]
        # identical score multisets ...
        assert np.allclose(np.sort(sa.score.to_numpy()),
                           np.sort(sb.score.to_numpy()), atol=1e-12)
        # ... and wherever scores are strict, identical documents: only
        # equal-score ties may legally differ (docID tie-break labels)
        fa = {(c, t, round(s, 9)) for c, t, s in
              zip(sa.conv_id, sa.turn_idx, sa.score)}
        fb = {(c, t, round(s, 9)) for c, t, s in
              zip(sb.conv_id, sb.turn_idx, sb.score)}
        sc_a = np.sort(sa.score.to_numpy())
        boundary_tied = (len(sc_a) == 10 and
                         np.sum(np.isclose(sa.score.to_numpy(),
                                           sc_a[0])) > 1)
        if not boundary_tied:
            assert fa == fb


def test_merge_rejects_incompatible_layout(merged_vs_full, tmp_path):
    import json
    import os
    import shutil
    root, _, _ = merged_vs_full
    bad = tmp_path / "bad_delta"
    shutil.copytree(root / "delta", bad)
    sp = bad / "stats.json"
    s = json.loads(sp.read_text())
    s["num_buckets"] = s["num_buckets"] * 2
    sp.write_text(json.dumps(s))
    with pytest.raises(ValueError, match="num_buckets"):
        merge_indexes(str(root / "base"), str(bad), str(tmp_path / "out"))
