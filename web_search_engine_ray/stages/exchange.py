"""Direct (raw-Ray-task) hash exchange for the posting-run merge.

Why this exists: after A1 started emitting varbyte-compressed per-batch
runs, the merge's shuffle volume dropped to ~2 B/posting — at bench
scale a few tens of MB.  Ray Data's HASH_SHUFFLE operator is the right
tool when partitions are GB-sized (its aggregator actors amortize), but
its fixed coordination cost (~10 s per exchange on this machine)
dominates tiny exchanges.  This module implements the same semantics —
hash-partition runs by (bucket, salt), merge-encode each partition,
re-route encoded lists by bucket, splice + write per bucket — as plain
Ray tasks with ``num_returns`` fan-out: the classic two-stage map/reduce
shuffle, with no actor pools and no barriers beyond task scheduling.

``build_index`` picks the strategy via cfg.merge_strategy:
  - "direct" (default): this module.
  - "hash_shuffle": Dataset.repartition(keys=...) path — prefer on a
    real multi-node cluster at TB scale.

Both produce byte-identical segments (encode is canonical and finalize
sorts by term), verified by T-DET.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from web_search_engine_ray.stages.encoder import (SEGMENT_SCHEMA, _empty_cols,
                                                  encode_partition,
                                                  finalize_buckets_task)


def _split_by_pid(tbl: pa.Table, pids: np.ndarray, n_parts: int) -> list:
    """Split a table into n_parts sub-tables by a per-row partition id."""
    order = np.argsort(pids, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    sorted_pids = pids[order]
    bounds = np.searchsorted(sorted_pids, np.arange(n_parts + 1))
    return [sorted_tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
            for i in range(n_parts)]


@ray.remote
def _split_runs(n_parts: int, salt_s: int, *blocks: pa.Table):
    """Map side: route each run to partition (bucket*salt_s + salt) % P.
    Takes several input blocks per task (fewer tasks/objects)."""
    live = [b for b in blocks if b is not None and b.num_rows]
    if not live:
        empty = pa.table(_empty_cols(), schema=SEGMENT_SCHEMA)
        return tuple([empty] * n_parts) if n_parts > 1 else empty
    block = pa.concat_tables(live)
    b = block.column("bucket").to_numpy().astype(np.int64)
    s = block.column("salt").to_numpy().astype(np.int64)
    pids = ((b * salt_s + s) % n_parts).astype(np.int64)
    parts = _split_by_pid(block, pids, n_parts)
    return tuple(parts) if n_parts > 1 else parts[0]


@ray.remote
def _merge_partition(n_fin: int, *parts: pa.Table):
    """Reduce side: merge one (bucket, salt) partition's runs, then
    route the encoded posting lists to finalize groups by bucket."""
    live = [p for p in parts if p is not None and p.num_rows]
    if not live:
        empty = pa.table(_empty_cols(), schema=SEGMENT_SCHEMA)
        return tuple([empty] * n_fin) if n_fin > 1 else empty
    merged = encode_partition(pa.concat_tables(live))
    pids = merged.column("bucket").to_numpy().astype(np.int64) % n_fin
    parts_out = _split_by_pid(merged, pids, n_fin)
    return tuple(parts_out) if n_fin > 1 else parts_out[0]


@ray.remote
def _finalize_group(seg_dir: str, dict_dir: str, *parts: pa.Table) -> pa.Table:
    live = [p for p in parts if p is not None and p.num_rows]
    if not live:
        return pa.table({"bucket": pa.array([], pa.int32()),
                         "n_terms": pa.array([], pa.int64()),
                         "n_postings": pa.array([], pa.int64()),
                         "sha256": pa.array([], pa.string()),
                         "path": pa.array([], pa.string())})
    return finalize_buckets_task(pa.concat_tables(live),
                                 seg_dir=seg_dir, dict_dir=dict_dir)


def direct_merge(runs_ds: "ray.data.Dataset", seg_dir: str, dict_dir: str,
                 salt_s: int, n_cpus: int) -> list[dict]:
    """Run the two-stage exchange; returns per-bucket manifest rows.

    Scale note: object count is O(n_blocks * P1 + P1 * Q) — at true
    cluster scale raise partition sizes (or use merge_strategy
    "hash_shuffle") so objects stay MB-sized.
    """
    block_refs = [ref for bundle in runs_ds.iter_internal_ref_bundles()
                  for ref in bundle.block_refs]
    if not block_refs:
        return []
    p1 = max(4, n_cpus)
    # one finalize task per ~bucket: the write phase is the pipeline
    # tail (nothing overlaps after it), so it needs FULL width — and
    # buckets skew (DL-sentinel / hot-term buckets are several times
    # median), so more, smaller groups also shrink the straggler
    q = max(2, 2 * n_cpus)
    # ~one split task per CPU: coalesce input blocks to bound task/object
    # counts (n_tasks * p1 intermediate objects)
    n_split = min(len(block_refs), max(n_cpus, 8))
    chunks = [block_refs[i::n_split] for i in range(n_split)]
    split_out = [
        _split_runs.options(num_returns=p1).remote(p1, salt_s, *chunk)
        for chunk in chunks if chunk
    ]
    if p1 == 1:
        split_out = [[r] for r in split_out]
    merge_out = [
        _merge_partition.options(num_returns=q).remote(
            q, *[split_out[m][p] for m in range(len(split_out))])
        for p in range(p1)
    ]
    if q == 1:
        merge_out = [[r] for r in merge_out]
    fin_refs = [
        _finalize_group.remote(seg_dir, dict_dir,
                               *[merge_out[p][g] for p in range(p1)])
        for g in range(q)
    ]
    rows: list[dict] = []
    for tbl in ray.get(fin_refs):
        rows.extend(tbl.to_pylist())
    return rows
