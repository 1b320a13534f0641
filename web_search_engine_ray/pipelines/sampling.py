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


def weighted_sample(ds: "ray.data.Dataset", id_col: str, weight_col: str,
                    k: int) -> pa.Table:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each row draws u in (0, 1] from its PINNED content
    hash (md5 of the id — spec A.6, never Python hash()) and ranks by
    akey = ln(u) / weight; the global top-k by (akey desc, id) is the
    weighted sample.  Fully reproducible in SQL::

        ln((CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8))
             AS UBIGINT) + 1) / 4294967297.0) / weight

    (u = (first-8-hex-of-md5 + 1) / (2^32 + 1), so u > 0 — ln never
    sees 0; heavier rows draw keys nearer 0 and surface first).

    Shape: each batch emits only its LOCAL top-k candidate rows (the
    blockwise-candidate cut used by all the engine's top-k paths: the
    global winner set is a subset of the union of per-block winners),
    so k x n_blocks skinny rows reach the driver for the exact final
    selection — no sort, no shuffle, corpus-size-independent driver
    state.  Returns (id, weight, akey rounded 6)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def _cand(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = np.asarray([int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                            16) for i in ids], np.float64)
        w = batch.column(weight_col).to_numpy().astype(np.float64)
        akey = np.log((h + 1.0) / 4294967297.0) / w
        idn = np.asarray(ids)
        top = np.lexsort((idn, -akey))[:k]
        t = batch.take(pa.array(np.sort(top), pa.int64()))
        sel = np.sort(top)
        return pa.table({id_col: t.column(id_col),
                         weight_col: t.column(weight_col),
                         "akey": pa.array(akey[sel], pa.float64())})

    parts = []
    for t in ds.select_columns([id_col, weight_col]).map_batches(
            _cand, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None):
        if t.num_rows:
            parts.append(t)
    if not parts:
        sch = ds.schema()
        return pa.table({
            id_col: pa.array([], sch.types[sch.names.index(id_col)]),
            weight_col: pa.array([], sch.types[sch.names.index(weight_col)]),
            "akey": pa.array([], pa.float64())})
    cand = pa.concat_tables(parts)
    ids = cand.column(id_col).to_numpy()
    akey = cand.column("akey").to_numpy()
    top = np.lexsort((ids, -akey))[:k]
    out = cand.take(pa.array(top, pa.int64()))
    return pa.table({id_col: out.column(id_col),
                     weight_col: out.column(weight_col),
                     "akey": pa.array(np.round(
                         out.column("akey").to_numpy(), 6), pa.float64())})
