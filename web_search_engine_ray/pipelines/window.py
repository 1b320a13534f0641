"""Windowed / group-wise operators Ray Data lacks natively, expressed
as hash-partition + one vectorized pass per partition (the same
partitioning contract as functions/grouping.py — complete key groups
per block).

- group_topk: per-group top-k by an order column (the engine analog of
  SQL ``row_number() OVER (PARTITION BY ... ORDER BY ...) <= k``).
- tumbling_window_agg: fixed-width event-time windows per key (count +
  sum), the batch form of a streaming tumbling-window aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)


def group_topk_ds(ds: "ray.data.Dataset", key: str, order_col: str,
                  k: int, ascending: bool = False,
                  id_col: str | None = None) -> "ray.data.Dataset":
    """Dataset-returning form of :func:`group_topk` — use this when the
    key cardinality is corpus-scale (e.g. latest-row-per-user
    compaction over 10^9 users): the k-rows-per-key output stays
    distributed for ``write_parquet`` / further stages instead of
    collecting on the driver.  Row order across blocks is undefined
    (hash-partitioned); each row carries its 1-based ``rank``."""
    schema_names = [n for n in ds.schema().names]
    if id_col is None:
        id_col = next(
            (n for n in schema_names if n not in (key, order_col)), None)
        if id_col is None:
            raise ValueError(
                "group_topk needs a tie-break column: the input has no "
                f"column besides key={key!r} and order_col={order_col!r}; "
                "pass id_col= explicitly")
    elif id_col not in schema_names:
        raise ValueError(f"id_col {id_col!r} not in schema {schema_names}")

    def _select_topk(batch: pa.Table, with_rank: bool) -> pa.Table:
        import pyarrow.compute as pc
        if batch.num_rows == 0:
            if with_rank:
                return batch.append_column("rank",
                                           pa.array([], pa.int32()))
            return batch
        idx = pc.sort_indices(batch, sort_keys=[
            (key, "ascending"),
            (order_col, "descending" if not ascending else "ascending"),
            (id_col, "ascending")])
        t = batch.take(idx)
        keys_np = np.asarray(t.column(key).to_pylist(), dtype=object)
        starts, ends = group_slices([keys_np])
        n = np.minimum(ends - starts, k)
        off = np.arange(int(n.sum()), dtype=np.int64) - \
            np.repeat(np.cumsum(n) - n, n)
        out = t.take(pa.array(np.repeat(starts, n) + off, pa.int64()))
        if with_rank:
            out = out.append_column(
                "rank", pa.array((off + 1).astype(np.int32), pa.int32()))
        return out

    pruned = ds.map_batches(lambda b: _select_topk(b, False),
                            batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition(pruned, [key]).map_batches(
        lambda b: _select_topk(b, True), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True)


def group_topk(ds: "ray.data.Dataset", key: str, order_col: str,
               k: int, ascending: bool = False,
               id_col: str | None = None) -> pa.Table:
    """Top-k rows per key group, ordered by (order_col desc|asc),
    COLLECTED to one sorted driver table — for bounded key
    cardinalities (per-language, per-nation...); use
    :func:`group_topk_ds` when keys scale with the corpus.
    Ties broken by ``id_col`` ascending; when not given, the first
    column that is neither key nor order_col is used (and a ValueError
    is raised if none exists — pass id_col explicitly for stability
    across schema changes).

    Shape: a per-BLOCK combiner first prunes each block to its own
    per-key top-k (any row outside a block's local top-k cannot be in
    the global top-k for that key), so the hash exchange ships at most
    k rows per key per block — not the full input; then one vectorized
    partition pass re-selects and ranks.  Per-group heap size k, never
    a global sort.
    """
    parts = group_topk_ds(ds, key, order_col, k, ascending, id_col)
    batches = [b for b in parts.iter_batches(batch_format="pyarrow")
               if b.num_rows]
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches).sort_by(
        [(key, "ascending"), ("rank", "ascending")])


def tumbling_window_agg(events: "ray.data.Dataset", key: str,
                        ts_col: str, value_col: str,
                        width_us: int) -> pa.Table:
    """Per (key, fixed ts window): count + sum(value).  window_start is
    the window's inclusive lower bound as timestamp[us].

    Pre-aggregates inside map_batches (combiner) so the shuffle carries
    one row per (block, key, window), then a small hash groupby — the
    pre-aggregate bounds shuffle volume by keys×windows per block, not
    by event count.
    """
    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        ts = batch.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        win = (ts // width_us) * width_us
        df = pd.DataFrame({
            "key": batch.column(key).to_pandas(),
            "window_us": win,
            "value": batch.column(value_col).to_numpy(),
        })
        g = df.groupby(["key", "window_us"], sort=False).agg(
            n=("value", "size"), total=("value", "sum")).reset_index()
        return pa.table({
            key: pa.array(g["key"]),
            "window_us": pa.array(g["window_us"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy(), pa.int64()),
            "total": pa.array(g["total"].to_numpy(), pa.float64()),
        })

    from ray.data.aggregate import Sum
    agg = (events.select_columns([key, ts_col, value_col])
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby([key, "window_us"])
           .aggregate(Sum("n"), Sum("total")))
    batches = [b for b in agg.iter_batches(batch_format="pyarrow")
               if b.num_rows]
    if not batches:
        return pa.table({key: pa.array([], pa.string()),
                         "window_start": pa.array([], pa.timestamp("us")),
                         "n_events": pa.array([], pa.int64()),
                         "total_value": pa.array([], pa.float64())})
    t = pa.concat_tables(batches)
    return pa.table({
        key: t.column(key),
        "window_start": t.column("window_us").cast(pa.timestamp("us")),
        "n_events": t.column("sum(n)").cast(pa.int64()),
        "total_value": pa.array(
            np.round(t.column("sum(total)").to_numpy(zero_copy_only=False)
                     .astype(np.float64), 6)),
    }).sort_by([(key, "ascending"), ("window_start", "ascending")])


def mode_by_key(ds: "ray.data.Dataset", key: str, val_col: str,
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """Per-key MODE of a categorical column: the most frequent value,
    ties broken by value ascending — exactly the SQL::

        SELECT key, val AS mode_val, count(*) AS n_mode ... QUALIFY
        row_number() OVER (PARTITION BY key
                           ORDER BY count(*) DESC, val) = 1

    Shape: per-batch (key, val) combiner counts (each batch collapses
    to its distinct pair count), ONE hash exchange of those partials on
    ``key``, then a per-partition vectorized pass — lexsort by (key,
    val), reduceat-sum the partials per pair, then a second lexsort by
    (key, -n, val) taking each key run's first row.  No driver state;
    emits (key, mode_val, n_mode)."""
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    val_t = sch.types[sch.names.index(val_col)]

    def _partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select([key, val_col]),
                            [key, val_col]).aggregate([([], "count_all")])
        return g.rename_columns([key, val_col, "n"])

    def _mode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], key_t),
                             "mode_val": pa.array([], val_t),
                             "n_mode": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        kenc = pc.dictionary_encode(batch.column(key)).combine_chunks()
        kcode = np.asarray(kenc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        venc = pc.dictionary_encode(batch.column(val_col)).combine_chunks()
        # dictionary order is first-appearance, NOT sorted: rank the
        # dictionary so vrank compares like the value itself
        vdict = np.asarray(venc.dictionary.to_pylist(), object)
        rank_of = np.empty(len(vdict), np.int64)
        rank_of[np.argsort(vdict)] = np.arange(len(vdict))
        vrank = rank_of[np.asarray(venc.indices.to_numpy(
            zero_copy_only=False), np.int64)]
        n = np.asarray(batch.column("n").to_numpy(), np.int64)
        # 1) sum partials per (key, val)
        o1 = np.lexsort((vrank, kcode))
        starts, ends = group_slices([kcode[o1], vrank[o1]])
        pair_n = np.add.reduceat(n[o1], starts)
        pk, pv = kcode[o1][starts], vrank[o1][starts]
        # 2) first row per key ordered by (n desc, val asc)
        o2 = np.lexsort((pv, -pair_n, pk))
        ks, _ke = group_slices([pk[o2]])
        top = o2[ks]
        rows = o1[starts[top]]
        t = batch.take(pa.array(rows, pa.int64()))
        return pa.table({key: t.column(key),
                         "mode_val": t.column(val_col),
                         "n_mode": pa.array(pair_n[top], pa.int64())})

    partials = ds.select_columns([key, val_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition(partials, [key], num_partitions).map_batches(
        _mode, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def first_last_by_key(ds: "ray.data.Dataset", key: str, ts_col: str,
                      val_col: str, id_col: str,
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """Per-key FIRST_VALUE / LAST_VALUE of ``val_col`` ordered by
    (ts, id) — the aggregate form of::

        SELECT DISTINCT key,
               first_value(val) OVER w AS first_val,
               last_value(val)  OVER w AS last_val
        ... WINDOW w AS (PARTITION BY key ORDER BY ts, id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)

    Shape: per-batch combiner keeps only each key's two extremal rows
    (min and max (ts, id)) — the exchange ships <= 2 rows per key per
    block, never the full input — then ONE hash exchange on the key
    and the same extremal kernel per partition, emitting (key,
    first_val, last_val).  No driver state; extremal selection is one
    lexsort + run slicing, no per-row loop."""
    sch = ds.schema()
    key_t = sch.types[sch.names.index(key)]
    val_t = sch.types[sch.names.index(val_col)]
    cols = [key, ts_col, id_col, val_col]

    def _extremal_rows(batch: pa.Table) -> pa.Table:
        """Each key's (ts, id)-min and (ts, id)-max rows (deduped)."""
        if batch.num_rows == 0:
            return batch
        import pyarrow.compute as pc
        enc = pc.dictionary_encode(batch.column(key)).combine_chunks()
        kcode = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        ts = batch.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, ts, kcode))
        starts, ends = group_slices([kcode[order]])
        take = np.unique(np.r_[order[starts], order[ends - 1]])
        return batch.take(pa.array(take, pa.int64()))

    def _reduce(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], key_t),
                             "first_val": pa.array([], val_t),
                             "last_val": pa.array([], val_t)})
        import pyarrow.compute as pc
        enc = pc.dictionary_encode(batch.column(key)).combine_chunks()
        kcode = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        ts = batch.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        ids = batch.column(id_col).to_numpy()
        order = np.lexsort((ids, ts, kcode))
        starts, ends = group_slices([kcode[order]])
        firsts = batch.take(pa.array(order[starts], pa.int64()))
        lasts = batch.take(pa.array(order[ends - 1], pa.int64()))
        return pa.table({key: firsts.column(key),
                         "first_val": firsts.column(val_col),
                         "last_val": lasts.column(val_col)})

    partials = ds.select_columns(cols).map_batches(
        _extremal_rows, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition(partials, [key], num_partitions).map_batches(
        _reduce, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def resample_ffill(events: "ray.data.Dataset", key: str, ts_col: str,
                   value_col: str, width_us: int,
                   num_partitions: int | None = None) -> "ray.data.Dataset":
    """Time-series resample with gap filling: per key, a DENSE bucket
    grid from its first to its last observed bucket; each bucket
    carries its event count (0 for gaps) and the forward-filled bucket
    value sum (rounded to 6; gaps inherit the last observed bucket —
    the ``last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY
    bucket)`` SQL).  The first bucket per key is observed by
    construction, so the fill column is never null.

    Shape: per-batch combiner partials (key, bucket, n, sum) — shuffle
    volume is keys x buckets per block, not event count — then ONE hash
    exchange on the key and a per-partition vectorized pass (reduceat
    pair sums, arange grid, scatter + maximum.accumulate fill).

    Partitioning assumption: a key's GRID (time-span / width) must fit
    one partition — the per-key analog of the module's complete-groups
    contract; widen ``width_us`` or shard the time range upstream for
    multi-year spans at second resolution."""
    sch = events.schema()
    key_t = sch.types[sch.names.index(key)]

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        ts = batch.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        win = (ts // width_us) * width_us
        df = pd.DataFrame({
            "k": batch.column(key).to_pandas(),
            "bucket_us": win,
            "v": batch.column(value_col).to_numpy()})
        g = df.groupby(["k", "bucket_us"], sort=False).agg(
            n=("v", "size"), s=("v", "sum")).reset_index()
        return pa.table({
            key: pa.array(g["k"]),
            "bucket_us": pa.array(g["bucket_us"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy(), pa.int64()),
            "s": pa.array(g["s"].to_numpy(), pa.float64())})

    def _grid(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], key_t),
                             "bucket_ts": pa.array([], pa.timestamp("us")),
                             "n_events": pa.array([], pa.int64()),
                             "v_ffill": pa.array([], pa.float64())})
        import pyarrow.compute as pc
        enc = pc.dictionary_encode(batch.column(key)).combine_chunks()
        kcode = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        bucket = batch.column("bucket_us").to_numpy()
        n = batch.column("n").to_numpy()
        s = batch.column("s").to_numpy()
        o = np.lexsort((bucket, kcode))
        kc, bk = kcode[o], bucket[o]
        pst, pen = group_slices([kc, bk])
        pair_k, pair_b = kc[pst], bk[pst]
        pair_n = np.add.reduceat(n[o], pst)
        pair_s = np.add.reduceat(s[o], pst)
        kst, ken = group_slices([pair_k])
        lo, hi = pair_b[kst], pair_b[ken - 1]
        glen = (hi - lo) // width_us + 1
        total = int(glen.sum())
        run_off = np.r_[0, np.cumsum(glen)[:-1]]
        # dense grid: per key run, buckets lo, lo+w, ..., hi
        idx = np.arange(total, dtype=np.int64)
        rep_off = np.repeat(run_off, glen)
        rep_lo = np.repeat(lo, glen)
        out_bucket = rep_lo + (idx - rep_off) * width_us
        out_key_code = np.repeat(pair_k[kst], glen)
        out_n = np.zeros(total, np.int64)
        out_s = np.full(total, np.nan)
        # scatter observed pairs into their grid slots
        slot = run_off[np.searchsorted(pair_k[kst], pair_k)] \
            + (pair_b - np.repeat(lo, ken - kst)) // width_us
        out_n[slot] = pair_n
        out_s[slot] = np.round(pair_s, 6)
        # forward fill: each run's first slot is observed, so a global
        # maximum.accumulate of fill positions never crosses runs
        fill_idx = np.where(out_n > 0, idx, -1)
        fill_idx = np.maximum.accumulate(fill_idx)
        v_ffill = out_s[fill_idx]
        kdict = enc.dictionary
        return pa.table({
            key: kdict.take(pa.array(out_key_code, pa.int64())),
            "bucket_ts": pa.array(out_bucket, pa.int64())
                .cast(pa.timestamp("us")),
            "n_events": pa.array(out_n, pa.int64()),
            "v_ffill": pa.array(v_ffill, pa.float64())})

    partials = events.select_columns([key, ts_col, value_col]) \
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition(partials, [key], num_partitions).map_batches(
        _grid, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
