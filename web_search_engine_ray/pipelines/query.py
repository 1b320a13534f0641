"""E2 — run_queries: BM25 top-k serving over a built index (SURVEY.md §3).

queries Dataset -> map_batches(QueryScorer actor pool) -> results
(query_id, rank, doc_id, score) -> optional J2 join to doc_table for
(conv_id, turn_idx) -> sort (query_id, rank).

The scorer actors each open the index once (dictionary + stats + doc_len
array) in __init__; queries stream through the pool.  The J2 join uses a
parquet filtered read on the tiny result doc_id set (broadcast-style
map-side lookup, SURVEY.md §2.4) rather than an all-to-all join.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from web_search_engine_ray.stages.scorer import QueryScorer


def run_queries(index_dir: str, queries: "ray.data.Dataset | pa.Table",
                k: int = 10, mode: str = "wand",
                attach_doc_meta: bool = False,
                concurrency: tuple[int, int] | int | None = None) -> pa.Table:
    """Score queries against the index; returns the results table (T7),
    sorted by (query_id, rank).

    mode="wand" (default): one actor-task per query batch, block-max
    WAND with the lossless path policy — the streaming form for very
    large query sets (no driver-side planning).  mode="sharded" /
    "auto" (equivalent): plan each query against the dictionary; light
    queries become one full-range shard (scored by WAND inside the
    task), heavy (stopword-class) queries split into doc-range shards
    scored in parallel (SURVEY.md G4 partial heaps) — rank-identical to
    pure WAND, and the parallel heavy path dominates the p95 tail.
    The index is loaded once and shared via the object store either way
    (share_index), so actors never duplicate segment I/O.
    """
    if isinstance(queries, pa.Table):
        queries_tbl = queries
        queries_ds = None
    else:
        queries_ds = queries
        queries_tbl = None
    n = max(1, int(ray.cluster_resources().get("CPU", 4)))
    if concurrency is None:
        # fixed pool: autoscaling (1, n) ramps too slowly for a serve
        # call that lives seconds; index open is cheap via share_index
        # (plasma views), so spinning the whole pool up front wins.
        # ALWAYS leave >= 2 CPUs for upstream tasks (repartition/read) —
        # a pool grabbing every CPU deadlocks the pipeline.
        concurrency = max(1, min(8, n - 2))
    if mode in ("auto", "sharded"):
        if queries_tbl is None:
            queries_tbl = pa.concat_tables(
                list(queries_ds.iter_batches(batch_format="pyarrow")))
        tbl = _run_queries_sharded(index_dir, queries_tbl, k, n, concurrency)
    else:
        if queries_ds is None:
            queries_ds = ray.data.from_arrow(queries_tbl)
            # from_arrow yields ONE block = one task = a sequential
            # serve; split so the pool actually runs in parallel
            nb = max(1, min(4 * (concurrency if isinstance(concurrency, int)
                                 else concurrency[1]),
                            (queries_tbl.num_rows + 7) // 8))
            if nb > 1:
                queries_ds = queries_ds.repartition(num_blocks=nb)
        from web_search_engine_ray.stages.scorer import share_index
        shared = share_index(index_dir)
        results = queries_ds.map_batches(
            QueryScorer, fn_constructor_args=(index_dir, k, mode, shared),
            batch_format="pyarrow", batch_size=8, concurrency=concurrency,
        )
        batches = list(results.iter_batches(batch_format="pyarrow"))
        tbl = pa.concat_tables(batches) if batches else _empty_results()
    if tbl.num_rows and attach_doc_meta:
        tbl = attach_doc_metadata(index_dir, tbl)
    return tbl.sort_by([("query_id", "ascending"), ("rank", "ascending")])


def _run_queries_sharded(index_dir: str, queries: pa.Table, k: int,
                         n_cpus: int, concurrency) -> pa.Table:
    import numpy as np

    from web_search_engine_ray.state.manifest import read_stats
    from web_search_engine_ray.stages.scorer import (ShardScorer,
                                                     plan_query_shards)
    stats = read_stats(index_dir)
    n_docs = int(stats["max_doc_id"]) + 1
    # plan shards per query (driver-side; needs only the term df map)
    dictionary = _load_dictionary(index_dir)
    qids, qs, los, his = [], [], [], []
    for qid, q in zip(queries.column("query_id").to_pylist(),
                      queries.column("query").to_pylist()):
        for lo, hi in plan_query_shards(dictionary, n_docs, q,
                                        max_shards=n_cpus):
            qids.append(qid)
            qs.append(q)
            los.append(lo)
            his.append(hi)
    expanded = pa.table({"query_id": pa.array(qids, pa.int64()),
                         "query": pa.array(qs, pa.string()),
                         "lo": pa.array(los, pa.int64()),
                         "hi": pa.array(his, pa.int64())})
    from web_search_engine_ray.stages.scorer import share_index
    shared = share_index(index_dir)
    shard_ds = ray.data.from_arrow(expanded)
    nb = max(1, min(64, (expanded.num_rows + 1) // 2))
    if nb > 1:   # one block = one task = sequential scoring
        shard_ds = shard_ds.repartition(num_blocks=nb)
    parts = shard_ds.map_batches(
        ShardScorer, fn_constructor_args=(index_dir, k, shared),
        batch_format="pyarrow", batch_size=4, concurrency=concurrency)
    batches = list(parts.iter_batches(batch_format="pyarrow"))
    if not batches:
        return _empty_results()
    cand = pa.concat_tables(batches)
    # driver-side heap merge: candidates are <= n_queries * shards * k
    out_q, out_r, out_d, out_s = [], [], [], []
    qarr = cand.column("query_id").to_numpy()
    darr = cand.column("doc_id").to_numpy()
    sarr = cand.column("score").to_numpy()
    for qid in np.unique(qarr):
        m = qarr == qid
        d, s = darr[m], sarr[m]
        # shards are disjoint doc ranges -> doc_ids unique per query
        order = np.lexsort((d, -s))[:k]
        out_q.extend([int(qid)] * len(order))
        out_r.extend(range(1, len(order) + 1))
        out_d.extend(d[order].tolist())
        out_s.extend(s[order].tolist())
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int32()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "score": pa.array(out_s, pa.float64())})


def _load_dictionary(index_dir: str):
    """Sorted Arrow-native Dictionary (binary-search lookups); cached
    per process."""
    from web_search_engine_ray.stages.scorer import Dictionary
    cache = _load_dictionary.__dict__.setdefault("_cache", {})
    if index_dir in cache:
        return cache[index_dir]
    d = Dictionary.load(index_dir)
    if len(cache) > 8:
        cache.clear()
    cache[index_dir] = d
    return d


def _empty_results() -> pa.Table:
    return pa.table({"query_id": pa.array([], pa.int64()),
                     "rank": pa.array([], pa.int32()),
                     "doc_id": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())})


def attach_doc_metadata(index_dir: str, results: pa.Table) -> pa.Table:
    """J2: doc_id -> (conv_id, turn_idx) via a filtered doc_table read.

    The result set is tiny (queries × k), so this is a map-side lookup:
    parquet row-group predicate pushdown on doc_id, then an in-memory
    hash join — never an all-to-all shuffle.
    """
    import pyarrow.dataset as pads
    doc_dir = os.path.join(index_dir, "doc_table")
    present = set(pads.dataset(doc_dir, format="parquet").schema.names)
    if "conv_id" not in present or "turn_idx" not in present:
        # corpus-kind index (doc_id, text, ...): no transcript metadata to
        # attach — null-fill so callers get a stable results schema.
        n = results.num_rows
        return results.append_column(
            "conv_id", pa.array([None] * n, pa.string())).append_column(
            "turn_idx", pa.array([None] * n, pa.int32()))
    wanted = pc.unique(results.column("doc_id"))
    dt = pq.read_table(
        doc_dir,
        columns=["doc_id", "conv_id", "turn_idx"],
        filters=[("doc_id", "in", wanted.to_pylist())])
    lookup = {d: (c, t) for d, c, t in zip(
        dt.column("doc_id").to_pylist(), dt.column("conv_id").to_pylist(),
        dt.column("turn_idx").to_pylist())}
    convs, turns = [], []
    for d in results.column("doc_id").to_pylist():
        c, t = lookup.get(d, (None, None))
        convs.append(c)
        turns.append(t)
    return results.append_column(
        "conv_id", pa.array(convs, pa.string())).append_column(
        "turn_idx", pa.array(turns, pa.int32()))
