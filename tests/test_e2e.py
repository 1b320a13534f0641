"""End-to-end build + query on the tiny fixture corpus (SURVEY.md §5.3):
T-INV (text invariant), T-E2E (rank identity vs oracles), T-SKEW.
"""

import numpy as np
import pyarrow.parquet as pq

from web_search_engine_ray.pipelines.query import run_queries
from web_search_engine_ray.sources.transcripts import (
    HOT_TERMS, gen_queries, gen_transcripts_table)
from web_search_engine_ray.stages.scorer import (
    IndexReader, OracleScorer, exhaustive_topk)


def test_doc_table_invariant(tiny_index, tiny_corpus_table):
    """T-INV: per-turn text byte-equality under stable (conv_id, turn_idx)
    ordering (BASELINE.json input_hint invariant)."""
    out, stats = tiny_index
    dt = pq.read_table(f"{out}/doc_table").to_pandas().sort_values("doc_id")
    src = tiny_corpus_table.to_pandas()
    assert len(dt) == len(src) == stats["n_docs"]
    # doc_id ordering == (conv_id, turn_idx) ordering, dense
    assert (dt["doc_id"].to_numpy() == np.arange(len(dt))).all()
    merged = dt.merge(src, on=["conv_id", "turn_idx"], suffixes=("", "_src"))
    assert len(merged) == len(src)
    assert (merged["text"] == merged["text_src"]).all()       # byte equality
    assert (merged["doc_id"] == merged["doc_id_src"]).all()   # same enumeration
    assert (merged["ts"] == merged["ts_src"]).all()


def test_dictionary_df_cf(tiny_index, tiny_corpus_table):
    """Dictionary df/cf match a naive recount (G2/G5)."""
    out, _ = tiny_index
    from collections import Counter

    from web_search_engine_ray.spec import tokenize
    df, cf = Counter(), Counter()
    for text in tiny_corpus_table.column("text").to_pylist():
        toks = tokenize(text)
        cf.update(toks)
        df.update(set(toks))
    d = pq.read_table(f"{out}/dictionary").to_pandas()
    assert len(d) == len(df)
    for term, ddf, dcf in zip(d["term"], d["df"], d["cf"]):
        assert df[term] == ddf, term
        assert cf[term] == dcf, term


def test_rank_identity_full_query_set(tiny_index, tiny_corpus_table):
    """T-E2E + conformance 5.2: WAND == exhaustive == in-memory oracle on
    all 100 reference queries, exact doc_id sequence, bit-equal scores."""
    out, _ = tiny_index
    res = run_queries(out, gen_queries(), k=10, mode="wand")
    orc = OracleScorer(tiny_corpus_table.select(["doc_id", "text"]))
    reader = IndexReader(out)
    q = gen_queries()
    qid_col = res.column("query_id").to_numpy()
    for qid, query in zip(q.column("query_id").to_pylist(),
                          q.column("query").to_pylist()):
        od, osc = orc.topk(query, 10)
        mask = qid_col == qid
        assert res.column("doc_id").to_numpy()[mask].tolist() == od, query
        assert np.array_equal(res.column("score").to_numpy()[mask],
                              np.array(osc)), query
        xd, xs = exhaustive_topk(reader, query, 10)
        assert xd.tolist() == od and np.array_equal(xs, np.array(osc)), query


def test_skew_salting_taken(tiny_index):
    """T-SKEW: planted hot terms were detected and doc-range salted."""
    out, stats = tiny_index
    import json
    with open(f"{out}/manifest.json") as f:
        man = json.load(f)
    hot = set(man["stages"]["hot_terms"]["hot_terms"])
    assert set(HOT_TERMS) <= hot
    # hot terms still have correct postings: df == n after splicing
    d = pq.read_table(f"{out}/dictionary").to_pandas().set_index("term")
    n_docs = stats["n_docs"]
    for t in HOT_TERMS:
        assert d.loc[t, "df"] > 0.8 * n_docs  # stopword-like by construction


def test_adversarial_queries(tiny_index, tiny_corpus_table):
    out, _ = tiny_index
    reader = IndexReader(out)
    orc = OracleScorer(tiny_corpus_table.select(["doc_id", "text"]))
    from web_search_engine_ray.stages.scorer import wand_topk
    cases = [
        "",                       # empty query
        "zzz unknownterm",        # only unseen terms
        "t0000 t0001 t0002",      # hot-only
        "alpha beta gamma",       # pure tie-break (planted identical docs)
        "t4999",                  # rare tail term, likely k > matches
        "t0000 t0000 t0000",      # duplicate query terms
    ]
    for query in cases:
        od, osc = orc.topk(query, 10)
        wd, ws = wand_topk(reader, query, 10)
        assert wd.tolist() == od, query
        assert np.array_equal(ws, np.array(osc)), query


def test_tie_break_order(tiny_index, tiny_corpus_table):
    """Equal-score docs must rank by ascending doc_id (spec A.5)."""
    out, _ = tiny_index
    reader = IndexReader(out)
    from web_search_engine_ray.stages.scorer import wand_topk
    docs, scores = wand_topk(reader, "alpha beta gamma", 10)
    assert len(docs) > 1
    for i in range(len(docs) - 1):
        if scores[i] == scores[i + 1]:
            assert docs[i] < docs[i + 1]
        else:
            assert scores[i] > scores[i + 1]


def test_sharded_serve_rank_identity(tiny_index, tiny_corpus_table):
    """Doc-sharded parallel serving (G4 partial heaps) must equal the
    single-cursor WAND results exactly."""
    out, _ = tiny_index
    a = run_queries(out, gen_queries(), k=10, mode="wand")
    b = run_queries(out, gen_queries(), k=10, mode="sharded")
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert a.column("score").to_pylist() == b.column("score").to_pylist()
    assert a.column("rank").to_pylist() == b.column("rank").to_pylist()


def test_auto_mode_matches_wand(tiny_index):
    """mode='auto' (heavy->sharded, light->WAND routing) is lossless:
    identical tables to pure WAND over the full query mix."""
    from web_search_engine_ray.pipelines.query import run_queries
    from web_search_engine_ray.sources.transcripts import gen_queries
    out, _ = tiny_index
    a = run_queries(out, gen_queries(), k=10, mode="wand").to_pandas()
    b = run_queries(out, gen_queries(), k=10, mode="auto").to_pandas()
    assert a.equals(b)


def test_dictionary_lookup_parity(tiny_index):
    """Arrow-native Dictionary == the parquet rows, including misses."""
    import pyarrow.parquet as pq
    import os
    from web_search_engine_ray.stages.scorer import Dictionary
    out, _ = tiny_index
    d = Dictionary.load(out)
    tbl = pq.read_table(os.path.join(out, "dictionary"))
    for term, bucket, df, cf, mtf in zip(
            tbl.column("term").to_pylist(), tbl.column("bucket").to_pylist(),
            tbl.column("df").to_pylist(), tbl.column("cf").to_pylist(),
            tbl.column("max_tf").to_pylist()):
        assert d[term] == (bucket, df, cf, mtf)
        assert term in d
    assert d.get("zz-not-a-term") is None and "zz-not-a-term" not in d
    assert len(d) == tbl.num_rows


def test_ondemand_broker_matches_eager(tiny_index):
    """share_index(segments="ondemand") — the larger-than-RAM form —
    serves rank-identical results to the eager whole-index share, and
    the broker's plasma footprint is bounded by TOUCHED buckets."""
    import ray
    from web_search_engine_ray.sources.transcripts import gen_queries
    from web_search_engine_ray.stages.scorer import (IndexReader,
                                                     share_index, wand_topk)
    out, _ = tiny_index
    share_index.__dict__.get("_cache", {}).clear()
    eager = share_index(out, segments="eager")
    lazy = share_index(out, segments="ondemand")
    r_e = IndexReader(out, shared=eager)
    r_l = IndexReader(out, shared=lazy)
    queries = gen_queries().column("query").to_pylist()[:20]
    for q in queries:
        de, se = wand_topk(r_e, q, 10)
        dl, sl = wand_topk(r_l, q, 10)
        assert de.tolist() == dl.tolist()
        assert se.tolist() == sl.tolist()
    broker = ray.get(lazy)["segments_broker"]
    touched = ray.get(broker.touched.remote())
    eager_buckets = ray.get(eager)["segments"]
    # every touched bucket is a real bucket; a 20-query mix must not
    # have forced the whole index into plasma
    assert set(touched) <= set(eager_buckets)
    assert len(touched) <= len(eager_buckets)
    share_index.__dict__["_cache"].clear()


def test_topk_auto_matches_wand(tiny_index, monkeypatch):
    """topk_auto (per-query heavy fan-out over plasma-shared shards) is
    rank-identical to single-process WAND for every query in the mix.
    The heaviness threshold is lowered so stopword-class queries
    actually shard on the tiny fixture index (the shard tasks
    themselves are scale-independent exhaustive_range_topk)."""
    from web_search_engine_ray.sources.transcripts import gen_queries
    from web_search_engine_ray.stages import scorer as sc
    from web_search_engine_ray.stages.scorer import (IndexReader,
                                                     share_index, topk_auto,
                                                     wand_topk)
    monkeypatch.setattr(sc, "HEAVY_POSTINGS", 200)
    monkeypatch.setattr(sc, "SHARD_POSTINGS", 100)
    out, _ = tiny_index
    shared = share_index(out)
    reader = IndexReader(out, shared=shared)
    sharded_any = 0
    for q in gen_queries().column("query").to_pylist():
        shards = sc.plan_query_shards(reader.dictionary,
                                      len(reader.doc_lens), q, max_shards=4)
        sharded_any += len(shards) > 1
        d_a, s_a = topk_auto(reader, q, 10, index_dir=out, shared=shared,
                             max_shards=4)
        d_w, s_w = wand_topk(reader, q, 10)
        assert d_a.tolist() == d_w.tolist()
        assert s_a.tolist() == s_w.tolist()
    assert sharded_any > 0, "query mix never exercised the sharded path"
