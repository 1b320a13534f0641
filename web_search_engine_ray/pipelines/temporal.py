"""Temporal operators Ray Data lacks natively: as-of join and
hopping (sliding) window aggregation.

- ``asof_join`` — for every left row, attach the latest right row of
  the same key with ``right.ts <= left.ts`` (DuckDB ASOF JOIN
  semantics, inner form).  Distributed shape: ONE tagged-union hash
  exchange on the key (both sides co-partitioned, reusing the
  hash_partition complete-groups contract), then a per-partition
  vectorized pass — one lexsort by (key, ts, side) + a cumsum scan
  over right-row markers.  No driver-side state.  When several right
  rows share a (key, ts), pass ``tie_col`` (a numeric right column)
  to pick the max-``tie_col`` row deterministically; without it the
  winner among exact (key, ts) right duplicates is partition-order
  dependent (same caveat as DuckDB ASOF over duplicate timestamps).
- ``hopping_window_agg`` — fixed windows of size W every S (< W means
  overlapping windows; W == S degenerates to tumbling).  Each batch
  expands rows into their W/S covering windows VECTORIZED (repeat +
  offset arithmetic on int64 microseconds), pre-aggregates per
  (window, key) — so the exchange moves combiner rows bounded by
  windows x keys per batch, never row x (W/S) copies.

Partitioning assumption (documented per SURVEY §2 custom-operator
rule): asof_join requires all rows of a join key to fit one hash
partition (same contract as functions/grouping.py:hash_partition);
salt or range-split keys hotter than a worker's heap upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str, ts_col: str, value_cols: list[str],
              suffix: str = "_r",
              num_partitions: int | None = None,
              tie_col: str | None = None) -> "ray.data.Dataset":
    """Inner as-of join: each left row gains ``value_cols`` from the
    latest right row with the same ``key`` and ``right.ts <= left.ts``;
    left rows with no qualifying right row are dropped.

    ``tie_col`` (optional, must be one of ``value_cols``, numeric):
    among right rows with EQUAL (key, ts) the max-``tie_col`` row wins
    deterministically; without it that winner depends on partition
    order (exact-duplicate right timestamps only)."""
    ls, rs = left.schema(), right.schema()
    for c in (key, ts_col):
        if c not in ls.names or c not in rs.names:
            raise ValueError(f"{c!r} must exist on both sides")
    missing = [c for c in value_cols if c not in rs.names]
    if missing:
        raise ValueError(f"value_cols not on right side: {missing}")
    if tie_col is not None and tie_col not in value_cols:
        raise ValueError("tie_col must be one of value_cols")
    l_keep = [n for n in ls.names if n != key]
    ren = {c: (c + suffix if c in ls.names else c) for c in value_cols}
    r_types = dict(zip(rs.names, rs.types))
    l_types = dict(zip(ls.names, ls.types))

    def _tag(side: int):
        keep = l_keep if side == 0 else [ts_col] + value_cols

        def tag(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {key: b.column(key)}
            for c in l_keep:
                cols[c] = b.column(c) if side == 0 else pa.nulls(
                    n, l_types[c])
            for c in value_cols:
                cols[ren[c]] = pa.nulls(n, r_types[c]) if side == 0 \
                    else b.column(c)
            if side == 1:
                cols[ts_col] = b.column(ts_col)
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols)
        return tag

    u = left.map_batches(_tag(0), batch_format="pyarrow",
                         zero_copy_batch=True).union(
        right.map_batches(_tag(1), batch_format="pyarrow",
                          zero_copy_batch=True))
    out_names = [key] + l_keep + [ren[c] for c in value_cols]

    def _merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array(
                [], l_types.get(c) or r_types[
                    next(k for k, v in ren.items() if v == c)])
                for c in out_names})
        side = b.column("__side").to_numpy()
        keys = b.column(key)
        ts = b.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        # one lexsort: (key, ts, side[, tie]) — RIGHT rows (1-side == 0)
        # sort BEFORE an equal-ts left row, so the cumsum scan below
        # (nearest PRECEDING right marker) sees a right row at
        # ts == left.ts, making the ts <= bound inclusive.  Among
        # equal-(key, ts) right rows the LAST in sort order wins: with
        # tie_col that is the max-tie_col row (lexsort ascending);
        # without, lexsort is stable so it is the last in partition
        # order (documented nondeterminism).
        enc = pc.dictionary_encode(keys)
        kcode = np.asarray(enc.combine_chunks().indices.to_numpy(
            zero_copy_only=False), np.int64)
        if tie_col is not None:
            tie = np.asarray(pc.fill_null(
                b.column(ren[tie_col]), 0).to_numpy(
                zero_copy_only=False), np.float64)
            order = np.lexsort((tie, 1 - side, ts, kcode))
        else:
            order = np.lexsort((1 - side, ts, kcode))
        kc, sd = kcode[order], side[order]
        starts, ends = group_slices([kc])
        # vectorized across the whole partition: for each left row the
        # candidate is the nearest preceding right row (running cumsum
        # of right markers), valid only inside the same key run
        is_right = sd == 1
        ridx = np.where(is_right)[0]
        # last right position at or before each slot, per key run
        last_r = np.full(len(sd), -1, np.int64)
        if len(ridx):
            mark = np.zeros(len(sd), np.int64)
            mark[ridx] = 1
            cum = np.cumsum(mark) - 1          # index into ridx
            has = cum >= 0
            last_r[has] = ridx[cum[has]]
        run_start = np.repeat(starts, ends - starts)
        lpos = np.where(~is_right)[0]
        cand = last_r[lpos]
        ok = (cand >= 0) & (cand >= run_start[lpos])
        lsel = order[lpos[ok]]
        rsel = order[cand[ok]]
        lt = b.take(pa.array(lsel, pa.int64()))
        rt = b.take(pa.array(rsel, pa.int64()))
        return pa.table(
            {key: lt.column(key)}
            | {c: lt.column(c) for c in l_keep}
            | {ren[c]: rt.column(ren[c]) for c in value_cols})

    return hash_partition(u, [key], num_partitions).map_batches(
        _merge, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def hopping_window_agg(ds: "ray.data.Dataset", ts_col: str, key: str,
                       val_col: str, window_us: int, slide_us: int,
                       num_partitions: int | None = None
                       ) -> "ray.data.Dataset":
    """(window_start, key, sum_value, n) over windows [k*S, k*S + W).
    W == S is tumbling; W > S overlaps (each row covers W/S windows).
    window_start is timestamp[us]; sums rounded to 6."""
    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"window_start": pa.array([], pa.int64()),
                             key: pa.array([], batch.schema.field(key).type
                                           if key in batch.schema.names
                                           else pa.string()),
                             "sum_value": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        t = batch.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        k_min = (t - window_us) // slide_us + 1
        k_max = t // slide_us
        reps = (k_max - k_min + 1).astype(np.int64)   # == W/S everywhere
        rows = np.repeat(np.arange(len(t)), reps)
        offs = np.concatenate([np.arange(r) for r in reps]) \
            if len(reps) else np.empty(0, np.int64)
        wk = (np.repeat(k_min, reps) + offs) * slide_us
        vals = batch.column(val_col).to_numpy().astype(np.float64)[rows]
        enc = pc.dictionary_encode(batch.column(key))
        kcode = np.asarray(enc.combine_chunks().indices.to_numpy(
            zero_copy_only=False), np.int64)[rows]
        uniq = enc.combine_chunks().dictionary
        # factorize the window starts FIRST: pairing the raw
        # microsecond value (~1.7e15 for current dates) with the key
        # code would silently wrap int64 above ~5e3 keys per batch;
        # pairing two small batch-local codes cannot (both are bounded
        # by the batch's expanded row count, product << 2^63)
        uwk, wcode = np.unique(wk, return_inverse=True)
        stride = np.int64(len(uniq) + 1)
        assert len(uwk) < np.iinfo(np.int64).max // max(stride, 1)
        comb = wcode.astype(np.int64) * stride + kcode
        ucomb, inv = np.unique(comb, return_inverse=True)
        sums = np.bincount(inv, weights=vals)
        ns = np.bincount(inv)
        out_w = uwk[ucomb // stride]
        out_k = (ucomb % stride).astype(np.int64)
        return pa.table({
            "window_start": pa.array(out_w, pa.int64()),
            key: uniq.take(pa.array(out_k, pa.int64())),
            "sum_value": pa.array(sums, pa.float64()),
            "n": pa.array(ns, pa.int64())})

    partials = ds.select_columns([ts_col, key, val_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)

    def _final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "window_start": pa.array([], pa.timestamp("us")),
                key: pa.array([], pa.string()),
                "sum_value": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64())})
        g = pa.TableGroupBy(batch, ["window_start", key]).aggregate(
            [("sum_value", "sum"), ("n", "sum")])
        return pa.table({
            "window_start": g.column("window_start").cast(
                pa.timestamp("us")),
            key: g.column(key),
            "sum_value": pa.array(np.round(
                g.column("sum_value_sum").to_numpy(), 6), pa.float64()),
            "n": g.column("n_sum")})

    return hash_partition(partials, ["window_start", key],
                          num_partitions).map_batches(
        _final, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
