"""Analytic (ordered window) functions Ray Data lacks natively:
per-key running aggregates and lag/lead shifts.

Both share one distributed shape: hash-partition on the key (the
repo-wide complete-groups contract, functions/grouping.py), then ONE
per-partition vectorized pass — a single lexsort by (key, ts, id)
followed by run-sliced numpy kernels.  No global sort, no driver-side
state; the exchange moves each row exactly once.

Ordering contract: rows within a key are ordered by (ts, id) — the id
tie-break makes results deterministic under duplicate timestamps and
is mirrored verbatim in the SQL oracles
(``OVER (PARTITION BY key ORDER BY ts, id)``).

Partitioning assumption (SURVEY §2 custom-operator rule): all rows of
a key must fit one hash partition — same contract as sessionize /
group_topk; salt or range-split hotter-than-heap keys upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)


def _sorted_runs(batch: pa.Table, key: str, ts_col: str, id_col: str):
    """(order, starts, ends, ts_int64) for one hash partition: one
    lexsort by (key, ts, id) + run detection over equal-key slices."""
    enc = pc.dictionary_encode(batch.column(key))
    kcode = np.asarray(enc.combine_chunks().indices.to_numpy(
        zero_copy_only=False), np.int64)
    ts = batch.column(ts_col).to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    ids = batch.column(id_col).to_numpy()
    order = np.lexsort((ids, ts, kcode))
    starts, ends = group_slices([kcode[order]])
    return order, starts, ends, ts


def running_sum(ds: "ray.data.Dataset", key: str, ts_col: str,
                val_col: str, id_col: str,
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """Per-key cumulative sum ordered by (ts, id) — the streaming form
    of ``SUM(val) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)``.  Also emits the 1-based running row number.  Sums are
    rounded to 6 (prefix sums accumulate left-to-right, the same order
    the SQL window frame pins)."""
    cols = [id_col, key, ts_col, val_col]
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    id_t = sch.types[sch.names.index(id_col)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_t),
                key: pa.array([], key_t),
                "running_sum": pa.array([], pa.float64()),
                "running_n": pa.array([], pa.int64())})
        order, starts, ends, _ts = _sorted_runs(batch, key, ts_col, id_col)
        vals = batch.column(val_col).to_numpy().astype(np.float64)[order]
        lens = ends - starts
        # per-run cumsum (NOT global-prefix-minus-base): float addition
        # is non-associative, and the SQL window frame accumulates each
        # partition left-to-right from ITS OWN first row — this matches
        # that summation order exactly, so values agree to the last ulp
        run_sum = np.empty(len(vals), np.float64)
        for s, e in zip(starts, ends):
            run_sum[s:e] = np.cumsum(vals[s:e])
        rn = np.arange(len(vals), dtype=np.int64) - \
            np.repeat(starts, lens) + 1
        t = batch.take(pa.array(order, pa.int64()))
        return pa.table({
            id_col: t.column(id_col),
            key: t.column(key),
            "running_sum": pa.array(np.round(run_sum, 6), pa.float64()),
            "running_n": pa.array(rn, pa.int64())})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def rolling_mean(ds: "ray.data.Dataset", key: str, ts_col: str,
                 val_col: str, id_col: str, window_rows: int,
                 num_partitions: int | None = None) -> "ray.data.Dataset":
    """Per-key moving average over the last ``window_rows`` rows
    (current row included), ordered by (ts, id) — ``AVG(val) OVER
    (PARTITION BY key ORDER BY ts, id ROWS BETWEEN window_rows-1
    PRECEDING AND CURRENT ROW)``.  Kernel: one prefix-sum per
    partition; each row's window sum is cum[i] - cum[i - w] clamped at
    its key run's start — no per-row loop."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    cols = [id_col, key, ts_col, val_col]
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    id_t = sch.types[sch.names.index(id_col)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_t),
                             key: pa.array([], key_t),
                             "rolling_mean": pa.array([], pa.float64())})
        order, starts, ends, _ts = _sorted_runs(batch, key, ts_col, id_col)
        vals = batch.column(val_col).to_numpy().astype(np.float64)[order]
        n = len(vals)
        lens = ends - starts
        run_start = np.repeat(starts, lens)
        cum = np.concatenate(([0.0], np.cumsum(vals)))
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(idx - window_rows + 1, run_start)
        wsum = cum[idx + 1] - cum[lo]
        wn = (idx - lo + 1).astype(np.float64)
        t = batch.take(pa.array(order, pa.int64()))
        return pa.table({
            id_col: t.column(id_col),
            key: t.column(key),
            "rolling_mean": pa.array(np.round(wsum / wn, 6), pa.float64())})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def rank_in_key(ds: "ray.data.Dataset", key: str, order_col: str,
                id_col: str, descending: bool = True,
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """ROW_NUMBER / RANK / DENSE_RANK within each key, ordered by
    (order_col [DESC|ASC], id) — exactly::

        row_number() OVER (PARTITION BY key ORDER BY order_col [DESC], id)
        rank()       OVER (PARTITION BY key ORDER BY order_col [DESC])
        dense_rank() OVER (PARTITION BY key ORDER BY order_col [DESC])

    ``rank``/``dense_rank`` tie on equal ``order_col`` values (the id
    tie-break applies only to ``row_num``'s total order, matching the
    SQL frames above).  Same distributed shape as the other analytic
    ops: ONE hash exchange on ``key``, then a single per-partition
    lexsort + run-sliced vectorized pass; no global sort, no driver
    state.  Emits (id, key, order_col, row_num, rnk, dense_rnk).

    Partitioning assumption: all rows of a key fit one hash partition
    (module docstring); ``order_col`` must be numeric when
    ``descending=True`` (sign-flip sort key).
    """
    cols = list(dict.fromkeys([id_col, key, order_col]))
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    id_t = sch.types[sch.names.index(id_col)]
    val_t = sch.types[sch.names.index(order_col)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_t),
                key: pa.array([], key_t),
                order_col: pa.array([], val_t),
                "row_num": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "dense_rnk": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(batch.column(key))
        kcode = np.asarray(enc.combine_chunks().indices.to_numpy(
            zero_copy_only=False), np.int64)
        vals = batch.column(order_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sort_val = -vals if descending else vals
        order = np.lexsort((ids, sort_val, kcode))
        kc, vv = kcode[order], vals[order]
        starts, ends = group_slices([kc])
        n = len(order)
        idx = np.arange(n, dtype=np.int64)
        lens = ends - starts
        run_start = np.repeat(starts, lens)
        # value-run boundaries: a new (key, value) pair starts here
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (kc[1:] != kc[:-1]) | (vv[1:] != vv[:-1])
        vstart = np.maximum.accumulate(np.where(change, idx, 0))
        c = np.cumsum(change)
        row_num = idx - run_start + 1
        rnk = vstart - run_start + 1
        dense = c - c[run_start] + 1
        t = batch.take(pa.array(order, pa.int64()))
        return pa.table({
            id_col: t.column(id_col),
            key: t.column(key),
            order_col: t.column(order_col),
            "row_num": pa.array(row_num, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
            "dense_rnk": pa.array(dense, pa.int64())})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def ntile_in_key(ds: "ray.data.Dataset", key: str, ts_col: str,
                 id_col: str, n_tiles: int,
                 num_partitions: int | None = None) -> "ray.data.Dataset":
    """NTILE(n) within each key, ordered by (ts, id) — exactly
    ``ntile(n) OVER (PARTITION BY key ORDER BY ts, id)``.

    SQL tile-size rule: a run of length L splits into q = L // n rows
    per tile with the first r = L %% n tiles getting one extra row —
    position p (0-based) maps to ``p // (q+1)`` while p < r*(q+1), else
    ``r + (p - r*(q+1)) // q``.  Both branches are one vectorized
    np.where over the partition; same distributed shape as the other
    analytic ops (ONE hash exchange, run-sliced kernel, no driver
    state).  Emits (id, key, tile) with tile in 1..n.
    """
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    cols = list(dict.fromkeys([id_col, key, ts_col]))
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    id_t = sch.types[sch.names.index(id_col)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_t),
                             key: pa.array([], key_t),
                             "tile": pa.array([], pa.int64())})
        order, starts, ends, _ts = _sorted_runs(batch, key, ts_col, id_col)
        lens = ends - starts
        run_len = np.repeat(lens, lens)
        pos = np.arange(len(order), dtype=np.int64) - np.repeat(starts, lens)
        q, r = run_len // n_tiles, run_len % n_tiles
        fat = r * (q + 1)          # rows covered by the q+1-sized tiles
        tile = np.where(
            pos < fat, pos // np.maximum(q + 1, 1),
            r + (pos - fat) // np.maximum(q, 1)) + 1
        t = batch.take(pa.array(order, pa.int64()))
        return pa.table({id_col: t.column(id_col),
                         key: t.column(key),
                         "tile": pa.array(tile, pa.int64())})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def shift_by_key(ds: "ray.data.Dataset", key: str, ts_col: str,
                 shift_col: str, id_col: str, offset: int = 1,
                 out_col: str | None = None,
                 num_partitions: int | None = None) -> "ray.data.Dataset":
    """LAG (offset > 0) / LEAD (offset < 0) of ``shift_col`` within each
    key, ordered by (ts, id); null where the shifted row falls outside
    the key's run — exactly ``LAG(shift_col, offset) OVER (PARTITION BY
    key ORDER BY ts, id)``."""
    if offset == 0:
        raise ValueError("offset must be nonzero (LAG > 0, LEAD < 0)")
    out_col = out_col or (f"lag_{shift_col}" if offset > 0
                          else f"lead_{shift_col}")
    cols = list(dict.fromkeys([id_col, key, ts_col, shift_col]))
    sch = ds.schema()
    shift_t = sch.types[sch.names.index(shift_col)]
    key_t = sch.types[sch.names.index(key)]
    id_t = sch.types[sch.names.index(id_col)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_t),
                             key: pa.array([], key_t),
                             out_col: pa.array([], shift_t)})
        order, starts, ends, _ts = _sorted_runs(batch, key, ts_col, id_col)
        n = len(order)
        lens = ends - starts
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        src = np.arange(n, dtype=np.int64) - offset
        valid = (pos >= offset) if offset > 0 else (pos < lens.repeat(lens)
                                                    + offset)
        t = batch.take(pa.array(order, pa.int64()))
        shifted_idx = np.where(valid, src, 0)
        shifted = t.column(shift_col).take(
            pa.array(shifted_idx, pa.int64()))
        out = pc.if_else(pa.array(valid), shifted.combine_chunks(),
                         pa.scalar(None, shift_t))
        return pa.table({id_col: t.column(id_col),
                         key: t.column(key),
                         out_col: out})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def dist_rank_in_key(ds: "ray.data.Dataset", key: str, order_col: str,
                     id_col: str, descending: bool = True,
                     num_partitions: int | None = None
                     ) -> "ray.data.Dataset":
    """PERCENT_RANK and CUME_DIST within each key over
    (order_col [DESC|ASC]) — exactly::

        percent_rank() OVER (PARTITION BY key ORDER BY order_col DESC)
        cume_dist()    OVER (PARTITION BY key ORDER BY order_col DESC)

    percent_rank = (rank - 1) / (L - 1) (0 for single-row keys);
    cume_dist = rows-with-order-value-not-after-current / L.  Same
    distributed shape as rank_in_key (ONE hash exchange + run-sliced
    pass); both outputs rounded to 6 (they are exact ratios of small
    ints — rounding only normalizes float formatting against the
    oracle).  Emits (id, key, order_col, pct_rank, cume_dist)."""
    cols = list(dict.fromkeys([id_col, key, order_col]))
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    id_t = sch.types[sch.names.index(id_col)]
    val_t = sch.types[sch.names.index(order_col)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], id_t),
                key: pa.array([], key_t),
                order_col: pa.array([], val_t),
                "pct_rank": pa.array([], pa.float64()),
                "cume_dist": pa.array([], pa.float64())})
        enc = pc.dictionary_encode(batch.column(key))
        kcode = np.asarray(enc.combine_chunks().indices.to_numpy(
            zero_copy_only=False), np.int64)
        vals = batch.column(order_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sort_val = -vals if descending else vals
        order = np.lexsort((ids, sort_val, kcode))
        kc, vv = kcode[order], vals[order]
        starts, ends = group_slices([kc])
        n = len(order)
        idx = np.arange(n, dtype=np.int64)
        lens = ends - starts
        run_start = np.repeat(starts, lens)
        run_len = np.repeat(lens, lens)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (kc[1:] != kc[:-1]) | (vv[1:] != vv[:-1])
        vstart = np.maximum.accumulate(np.where(change, idx, 0))
        # value-run END: the next change position (or n) — nested in
        # key runs because a key change always starts a new value run
        vr_starts = np.flatnonzero(change)
        vr_ends_per_run = np.r_[vr_starts[1:], n]
        vend = vr_ends_per_run[np.cumsum(change) - 1]
        rnk = vstart - run_start + 1
        pct = np.where(run_len > 1,
                       (rnk - 1) / np.maximum(run_len - 1, 1), 0.0)
        cume = (vend - run_start) / run_len
        t = batch.take(pa.array(order, pa.int64()))
        return pa.table({
            id_col: t.column(id_col),
            key: t.column(key),
            order_col: t.column(order_col),
            "pct_rank": pa.array(np.round(pct, 6), pa.float64()),
            "cume_dist": pa.array(np.round(cume, 6), pa.float64())})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def string_agg_by_key(ds: "ray.data.Dataset", key: str, val_col: str,
                      ts_col: str, id_col: str, sep: str = ",",
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """Per-key ordered concatenation — exactly ``string_agg(val, sep
    ORDER BY ts, id)``.  Same one-exchange run-sliced shape as the
    other analytic ops; the per-run join is a str.join over the run's
    slice (string assembly is inherently per key — the sort and run
    detection stay vectorized).  Emits (key, seq, n_vals).

    Partitioning assumption: a key's concatenated string must fit a
    worker's heap (it IS the output row) — same contract as the
    module's complete-groups rule."""
    cols = list(dict.fromkeys([key, val_col, ts_col, id_col]))
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], key_t),
                             "seq": pa.array([], pa.string()),
                             "n_vals": pa.array([], pa.int64())})
        order, starts, ends, _ts = _sorted_runs(batch, key, ts_col, id_col)
        vals = np.asarray(batch.column(val_col).to_numpy(
            zero_copy_only=False), object)[order]
        seqs = [sep.join(vals[s:e]) for s, e in zip(starts, ends)]
        t = batch.take(pa.array(order[starts], pa.int64()))
        return pa.table({
            key: t.column(key),
            "seq": pa.array(seqs, pa.string()),
            "n_vals": pa.array(ends - starts, pa.int64())})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def rolling_mean_range(ds: "ray.data.Dataset", key: str, ts_col: str,
                       val_col: str, id_col: str, interval_us: int,
                       num_partitions: int | None = None
                       ) -> "ray.data.Dataset":
    """Per-key TIME-based (RANGE-framed) moving average: for each row,
    the mean of the key's values with ts in [row.ts - interval,
    row.ts] — ``AVG(val) OVER (PARTITION BY key ORDER BY ts RANGE
    BETWEEN interval PRECEDING AND CURRENT ROW)``.  Unlike the
    ROWS-framed :func:`rolling_mean`, the frame is defined by the
    TIMESTAMP axis, and equal-ts PEERS are included (SQL RANGE frame
    semantics) — the frame end is ``searchsorted(ts, row.ts, right)``,
    not the row's own position.

    Kernel: one prefix-sum per partition; frame bounds via two
    searchsorted calls per key run (each O(len·log len), vectorized
    over the run's rows).  Same one-exchange shape and complete-groups
    contract as the module's other ops."""
    if interval_us < 0:
        raise ValueError("interval_us must be >= 0")
    cols = [id_col, key, ts_col, val_col]
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    id_t = sch.types[sch.names.index(id_col)]

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], id_t),
                             key: pa.array([], key_t),
                             "range_mean": pa.array([], pa.float64())})
        order, starts, ends, ts_raw = _sorted_runs(batch, key, ts_col,
                                                   id_col)
        ts = ts_raw[order]
        vals = batch.column(val_col).to_numpy().astype(np.float64)[order]
        cum = np.concatenate(([0.0], np.cumsum(vals)))
        n = len(vals)
        lo = np.empty(n, np.int64)
        hi = np.empty(n, np.int64)
        for s, e in zip(starts, ends):
            run_ts = ts[s:e]
            lo[s:e] = s + np.searchsorted(run_ts, run_ts - interval_us,
                                          side="left")
            hi[s:e] = s + np.searchsorted(run_ts, run_ts, side="right")
        wsum = cum[hi] - cum[lo]
        wn = (hi - lo).astype(np.float64)
        t = batch.take(pa.array(order, pa.int64()))
        return pa.table({
            id_col: t.column(id_col),
            key: t.column(key),
            "range_mean": pa.array(np.round(wsum / wn, 6), pa.float64())})

    return hash_partition(ds.select_columns(cols), [key],
                          num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
