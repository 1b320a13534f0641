"""Deterministic stratified sampling: n rows per group, selected by a
pinned content hash so the sample is stable under any partitioning,
corpus growth appends aside, and reproducible in SQL.

Rank rule: md5(str(id)) hex string ascending, ties by id — identical
to DuckDB ``ORDER BY md5(CAST(id AS VARCHAR)), id`` (spec A.6: never
Python ``hash()``).  Shape: each batch keeps only its local top-n per
group (candidate cut), ONE hash exchange of candidates (n x
n_batches rows per group, corpus-size-independent), exact selection
per partition."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)


def _ranks(ids: np.ndarray) -> np.ndarray:
    return np.asarray([hashlib.md5(str(i).encode()).hexdigest()
                       for i in ids], dtype=object)


def stratified_sample(ds: "ray.data.Dataset", key: str, id_col: str,
                      n_per_group: int,
                      num_partitions: int | None = None) -> pa.Table:
    """Rows of ``ds`` (all columns), at most ``n_per_group`` per
    ``key`` value, sorted (key, id)."""

    def _select(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        rk = _ranks(ids)
        kcol = np.asarray(batch.column(key).to_pylist(), dtype=object)
        order = np.lexsort((ids, rk, kcol))
        starts, ends = group_slices([kcol[order]])
        keep = np.concatenate([
            order[s:min(e, s + n_per_group)]
            for s, e in zip(starts, ends)]) if len(starts) else \
            np.empty(0, np.int64)
        return batch.take(pa.array(np.sort(keep), pa.int64()))

    cand = ds.map_batches(_select, batch_format="pyarrow",
                          zero_copy_batch=True)
    parts = list(hash_partition(cand, [key], num_partitions)
                 .map_batches(_select, batch_size=None,
                              batch_format="pyarrow", zero_copy_batch=True)
                 .iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table({n: pa.array([], t) for n, t in
                         zip(ds.schema().names, ds.schema().types)})
    return pa.concat_tables(parts, promote_options="default") \
        .sort_by([(key, "ascending"), (id_col, "ascending")])
