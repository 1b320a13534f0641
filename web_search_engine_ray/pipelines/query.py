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
    sorted by (query_id, rank)."""
    if isinstance(queries, pa.Table):
        queries_ds = ray.data.from_arrow(queries)
    else:
        queries_ds = queries
    if concurrency is None:
        n = max(1, int(ray.cluster_resources().get("CPU", 4)))
        concurrency = (1, min(n, 16))
    results = queries_ds.map_batches(
        QueryScorer, fn_constructor_args=(index_dir, k, mode),
        batch_format="pyarrow", batch_size=16, concurrency=concurrency,
    )
    batches = list(results.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(batches) if batches else _empty_results()
    if tbl.num_rows and attach_doc_meta:
        tbl = attach_doc_metadata(index_dir, tbl)
    return tbl.sort_by([("query_id", "ascending"), ("rank", "ascending")])


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
    wanted = pc.unique(results.column("doc_id"))
    dt = pq.read_table(
        os.path.join(index_dir, "doc_table"),
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
