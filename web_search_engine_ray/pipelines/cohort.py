"""Cohort analytics over event streams: first-seen (acquisition)
counts and the cohort-retention matrix.

Both are two-level aggregations over a per-user extremum (min ts), so
both use the same scale shape: a per-batch COMBINER first collapses
each block to at most |distinct users in block| rows, ONE hash
exchange on the user key co-locates each user's partials, and the
per-partition pass emits day-keyed partial counts whose driver-side
combine is bounded by |days| (resp. |days|^2) — never by user or
event cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)

DAY_US = 86_400_000_000


def _ts_int(batch: pa.Table, ts_col: str) -> np.ndarray:
    return batch.column(ts_col).to_numpy().astype("datetime64[us]") \
        .astype(np.int64)


def new_users_per_day(events: "ray.data.Dataset", user_col: str,
                      ts_col: str,
                      num_partitions: int | None = None) -> pa.Table:
    """Daily acquisition: for each day, the number of users whose
    FIRST event falls on that day — ``SELECT day, count(*) FROM
    (SELECT user, min(date_trunc('day', ts)) AS day GROUP BY user)
    GROUP BY day``.

    Per-batch combiner: min ts per user (block collapses to its
    distinct users).  One hash exchange on user; the partition pass
    takes the true min per user, truncates to day, and emits (day, n)
    partials; driver combine is |days| entries."""
    def _partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select([user_col, ts_col]),
                            [user_col]).aggregate([(ts_col, "min")])
        return g.rename_columns([user_col, "min_ts"])

    def _days(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"day_us": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        users = batch.column(user_col).to_numpy(zero_copy_only=False)
        ts = _ts_int(batch, "min_ts")
        order = np.lexsort((ts, users))
        starts, _ends = group_slices([users[order]])
        first = ts[order][starts]          # true min per user
        day = (first // DAY_US) * DAY_US
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table({"day_us": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    partials = events.select_columns([user_col, ts_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    acc: dict[int, int] = {}
    for b in hash_partition(partials, [user_col], num_partitions) \
            .map_batches(_days, batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for d, n in zip(b.column("day_us").to_pylist(),
                        b.column("n").to_pylist()):
            acc[d] = acc.get(d, 0) + n
    days = sorted(acc)
    return pa.table({
        "day": pa.array(np.asarray(days, np.int64).view("datetime64[us]"),
                        pa.timestamp("us")),
        "n_new_users": pa.array([acc[d] for d in days], pa.int64())})


def retention_matrix(events: "ray.data.Dataset", user_col: str,
                     ts_col: str,
                     num_partitions: int | None = None) -> pa.Table:
    """Cohort retention: (cohort_day, active_day, n_users) where
    cohort_day is the user's first-seen day and n_users counts the
    cohort's users active on active_day (active_day >= cohort_day by
    construction).

    Per-batch combiner: DISTINCT (user, day) pairs — the exchange
    ships at most users x days-per-block rows.  The partition pass
    sees each user's complete day set, takes its min as the cohort,
    and emits each user's distinct (cohort, day) pairs once, so the
    final count is a plain sum; driver combine is |days|^2 entries."""
    def _partial(batch: pa.Table) -> pa.Table:
        ts = _ts_int(batch, ts_col)
        day = (ts // DAY_US) * DAY_US
        g = pa.TableGroupBy(pa.table({
            user_col: batch.column(user_col),
            "day_us": pa.array(day, pa.int64())}),
            [user_col, "day_us"]).aggregate([])
        return g

    def _pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cohort_us": pa.array([], pa.int64()),
                             "day_us": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        users = batch.column(user_col).to_numpy(zero_copy_only=False)
        day = batch.column("day_us").to_numpy()
        order = np.lexsort((day, users))
        u, d = users[order], day[order]
        starts, ends = group_slices([u])
        # the partial may still hold duplicate (user, day) rows (one
        # per source block) — dedup within the run, then the run's
        # first day is the cohort
        lens = ends - starts
        cohort = np.repeat(d[starts], lens)
        keep = np.ones(len(d), bool)
        keep[1:] = (d[1:] != d[:-1]) | (u[1:] != u[:-1])
        pairs = np.stack([cohort[keep], d[keep]], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({"cohort_us": pa.array(uniq[:, 0], pa.int64()),
                         "day_us": pa.array(uniq[:, 1], pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    partials = events.select_columns([user_col, ts_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    acc: dict[tuple, int] = {}
    for b in hash_partition(partials, [user_col], num_partitions) \
            .map_batches(_pairs, batch_size=None, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for c, d, n in zip(b.column("cohort_us").to_pylist(),
                           b.column("day_us").to_pylist(),
                           b.column("n").to_pylist()):
            acc[(c, d)] = acc.get((c, d), 0) + n
    keys = sorted(acc)
    return pa.table({
        "cohort_day": pa.array(
            np.asarray([k[0] for k in keys], np.int64)
            .view("datetime64[us]"), pa.timestamp("us")),
        "active_day": pa.array(
            np.asarray([k[1] for k in keys], np.int64)
            .view("datetime64[us]"), pa.timestamp("us")),
        "n_users": pa.array([acc[k] for k in keys], pa.int64())})
