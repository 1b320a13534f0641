"""Ordered-pattern (funnel) analysis: how many keys performed step 1,
then step 2 strictly later, then step 3 strictly later, ...

Semantics (greedy earliest-match, the classic warehouse funnel): a key
reaches step s iff there is a strictly ts-increasing assignment of one
event per step 1..s.  Greedy-earliest is complete for this existence
question: if any valid increasing chain exists, the chain built from
the earliest step-1 time, then the earliest step-2 time after it, etc.,
also exists (each greedy prefix time is <= any valid prefix time, so
its candidate set is a superset).  This makes the operator equal to
the nested ``MIN(ts) ... WHERE ts > prev`` SQL form used as its oracle.

Distributed shape: ONE hash exchange on the key (complete-groups
contract, functions/grouping.py), then a per-partition vectorized pass
— one lexsort by (key, ts, id), then per STEP (not per key) a masked
segmented min over key runs via np.minimum.reduceat.  Work per
partition is O(rows * n_steps); driver state is n_steps counters.

Partitioning assumption: all rows of a key fit one hash partition —
same contract as sessionize / analytic ops; salt hot keys upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)


def funnel_counts(ds: "ray.data.Dataset", key: str, ts_col: str,
                  type_col: str, steps: list[str], id_col: str,
                  num_partitions: int | None = None) -> pa.Table:
    """Per-step conversion counts for the ordered pattern ``steps``.

    Returns a tiny (len(steps))-row table (step, event_type, n_keys):
    n_keys = number of distinct keys whose events contain the first s
    step types in strictly increasing ts order.  Equal timestamps do
    NOT satisfy the "later" requirement (strict >), matching the SQL
    oracle's ``e.ts > prev.t``.

    Only the n_steps partial counters per partition reach the driver —
    output-bounded regardless of corpus size.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cols = list(dict.fromkeys([id_col, key, ts_col, type_col]))
    n_steps = len(steps)

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"step": pa.array([], pa.int64()),
                             "n_keys": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(batch.column(key))
        kcode = np.asarray(enc.combine_chunks().indices.to_numpy(
            zero_copy_only=False), np.int64)
        ts = batch.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        tenc = pc.dictionary_encode(batch.column(type_col)).combine_chunks()
        tcode = np.asarray(tenc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        code_of = {v: i for i, v in enumerate(tenc.dictionary.to_pylist())}
        order = np.lexsort((ids, ts, kcode))
        kc, tss, typ = kcode[order], ts[order], tcode[order]
        starts, ends = group_slices([kc])
        lens = ends - starts
        n_runs = len(starts)
        inf = np.iinfo(np.int64).max
        # prev[r] = greedy ts of the previous step for run r (start: -inf
        # so step 1 needs no predecessor)
        prev = np.full(n_runs, np.iinfo(np.int64).min, np.int64)
        counts = np.zeros(n_steps, np.int64)
        for s, step in enumerate(steps):
            mask = (typ == code_of.get(step, -1)) & \
                (tss > np.repeat(prev, lens))
            cand = np.where(mask, tss, inf)
            # segmented min per key run; runs are non-empty by construction
            step_ts = np.minimum.reduceat(cand, starts)
            reached = step_ts < inf
            counts[s] = int(reached.sum())
            prev = np.where(reached, step_ts, inf)
            if not reached.any():
                counts[s:] = 0
                break
        return pa.table({"step": pa.array(np.arange(1, n_steps + 1),
                                          pa.int64()),
                         "n_keys": pa.array(counts, pa.int64())})

    parts = hash_partition(ds.select_columns(cols), [key],
                           num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
    # n_steps rows per partition -> n_steps totals: output-bounded driver
    # reduce (no corpus-sized transit)
    total = np.zeros(n_steps, np.int64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            total[np.asarray(b.column("step")) - 1] += \
                np.asarray(b.column("n_keys"))
    return pa.table({"step": pa.array(np.arange(1, n_steps + 1), pa.int64()),
                     "event_type": pa.array(steps, pa.string()),
                     "n_keys": pa.array(total, pa.int64())})
