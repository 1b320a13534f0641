"""Exact distributed quantiles WITHOUT a global sort.

Three streaming passes, no shuffle:

1. scalar aggregate (count, min, max);
2. fixed-width histogram — each batch bins its values with the SAME
   integer formula (floor((v-mn)/(mx-mn)·n_bins), clipped), partial
   counts summed on the driver (n_bins rows, corpus-size-independent);
3. fetch ONLY the bins that contain requested ranks (≈ n/n_bins rows
   per quantile reach the driver), sort those few values exactly, and
   pick rank - cumulative_before within each bin.

Matches DuckDB's ``quantile_disc`` exactly: the selected element is
the 0-based index max(0, ceil(q·n) - 1) of the sorted column.  At
100 TB, n_bins scales the pass-3 collect (n/n_bins values per needed
bin); a second histogram refinement inside the bin would bound it
further — one level suffices for the sandbox's value distributions.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)


def _bin_index(v: np.ndarray, mn: float, mx: float,
               n_bins: int) -> np.ndarray:
    idx = np.floor((v - mn) / (mx - mn) * n_bins).astype(np.int64)
    return np.clip(idx, 0, n_bins - 1)


def exact_quantiles(ds: "ray.data.Dataset", col: str,
                    qs: list[float], n_bins: int = 8192) -> pa.Table:
    """(q, value) rows, sorted by q — value is the exact quantile_disc
    element of ``col``."""
    from ray.data.aggregate import Count, Max, Min
    ds = ds.select_columns([col])
    agg = ds.aggregate(Count(), Min(col), Max(col))
    n = int(agg["count()"])
    out_q = pa.array(sorted(qs), pa.float64())
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    mn = float(agg[f"min({col})"])
    mx = float(agg[f"max({col})"])
    ranks = {q: max(0, math.ceil(q * n) - 1) for q in qs}
    if mx == mn:
        return pa.table({"q": out_q,
                         "value": pa.array([mn] * len(qs), pa.float64())})

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy().astype(np.float64)
        c = np.bincount(_bin_index(v, mn, mx, n_bins), minlength=n_bins)
        nz = np.flatnonzero(c)              # sparse: robust to rebatching
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(c[nz], pa.int64())})

    counts = np.zeros(n_bins, np.int64)
    for b in ds.map_batches(_hist, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        np.add.at(counts, b.column("bin").to_numpy(),
                  b.column("cnt").to_numpy())
    cum = np.cumsum(counts)
    before = cum - counts                   # count strictly below bin i
    need_bins = {}
    for q, r in ranks.items():
        b = int(np.searchsorted(cum, r + 1))
        need_bins.setdefault(b, []).append(q)
    wanted = np.asarray(sorted(need_bins), np.int64)

    def _fetch(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy().astype(np.float64)
        idx = _bin_index(v, mn, mx, n_bins)
        m = np.isin(idx, wanted)
        return pa.table({col: pa.array(v[m], pa.float64()),
                         "bin": pa.array(idx[m], pa.int64())})

    got = pa.concat_tables(list(
        ds.map_batches(_fetch, batch_format="pyarrow",
                       zero_copy_batch=True).iter_batches(
                           batch_format="pyarrow")))
    vals = got.column(col).to_numpy()
    bins = got.column("bin").to_numpy()
    answers = {}
    for b, qlist in need_bins.items():
        inbin = np.sort(vals[bins == b])
        for q in qlist:
            answers[q] = float(inbin[ranks[q] - int(before[b])])
    return pa.table({"q": out_q,
                     "value": pa.array([round(answers[q], 6)
                                        for q in sorted(qs)],
                                       pa.float64())})


def grouped_quantiles(ds: "ray.data.Dataset", key: str, col: str,
                      qs: list[float],
                      num_partitions: int | None = None) -> pa.Table:
    """(key, q, value) — exact quantile_disc per key, sorted (key, q).

    Shape: ONE hash exchange of the pruned (key, value) columns
    co-locates each key's rows, then a per-partition lexsort +
    reduceat-style gather answers every key in the partition
    vectorized.  This is the general-cardinality path (driver sees
    only result rows); for the scalar case prefer exact_quantiles,
    which never shuffles at all.  Keys hotter than a worker's heap
    need upstream salting (hash_partition contract)."""
    qarr = np.asarray(sorted(qs), np.float64)
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key]

    def _per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], key_type),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        import pyarrow.compute as pc
        enc = pc.dictionary_encode(batch.column(key)).combine_chunks()
        kcode = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        vals = batch.column(col).to_numpy().astype(np.float64)
        order = np.lexsort((vals, kcode))
        kc, vs = kcode[order], vals[order]
        starts, ends = group_slices([kc])
        n_g = len(starts)
        lens = ends - starts
        # rank within each group: max(0, ceil(q*n) - 1), gathered flat
        ranks = np.maximum(
            0, np.ceil(qarr[None, :] * lens[:, None]).astype(np.int64) - 1)
        flat_idx = (starts[:, None] + ranks).ravel()
        out_vals = np.round(vs[flat_idx], 6)
        out_keys = enc.dictionary.take(
            pa.array(np.repeat(kc[starts], len(qarr)), pa.int64()))
        return pa.table({
            key: out_keys,
            "q": pa.array(np.tile(qarr, n_g), pa.float64()),
            "value": pa.array(out_vals, pa.float64())})

    parts = list(
        hash_partition(ds.select_columns([key, col]), [key],
                       num_partitions)
        .map_batches(_per_partition, batch_size=None,
                     batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table({key: pa.array([], key_type),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    return pa.concat_tables(parts, promote_options="default") \
        .sort_by([(key, "ascending"), ("q", "ascending")])


def grouped_quantiles_cont(ds: "ray.data.Dataset", key: str, col: str,
                           qs: list[float],
                           num_partitions: int | None = None) -> pa.Table:
    """(key, q, value) — INTERPOLATED quantile (quantile_cont) per key,
    sorted (key, q): with h = q·(n-1) inside each key's sorted run,
    value = v[⌊h⌋] + (h-⌊h⌋)·(v[⌈h⌉] - v[⌊h⌋]).  Same one-exchange
    shape as :func:`grouped_quantiles`; the gather takes both
    neighboring order statistics per (key, q) vectorized."""
    qarr = np.asarray(sorted(qs), np.float64)
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key]

    def _per_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], key_type),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        import pyarrow.compute as pc
        enc = pc.dictionary_encode(batch.column(key)).combine_chunks()
        kcode = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        vals = batch.column(col).to_numpy().astype(np.float64)
        order = np.lexsort((vals, kcode))
        kc, vs = kcode[order], vals[order]
        starts, ends = group_slices([kc])
        n_g = len(starts)
        lens = ends - starts
        h = qarr[None, :] * (lens[:, None] - 1)
        lo = np.floor(h).astype(np.int64)
        hi = np.ceil(h).astype(np.int64)
        frac = h - lo
        v_lo = vs[(starts[:, None] + lo).ravel()]
        v_hi = vs[(starts[:, None] + hi).ravel()]
        out_vals = np.round(v_lo + frac.ravel() * (v_hi - v_lo), 6)
        out_keys = enc.dictionary.take(
            pa.array(np.repeat(kc[starts], len(qarr)), pa.int64()))
        return pa.table({
            key: out_keys,
            "q": pa.array(np.tile(qarr, n_g), pa.float64()),
            "value": pa.array(out_vals, pa.float64())})

    parts = list(
        hash_partition(ds.select_columns([key, col]), [key],
                       num_partitions)
        .map_batches(_per_partition, batch_size=None,
                     batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table({key: pa.array([], key_type),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    return pa.concat_tables(parts, promote_options="default") \
        .sort_by([(key, "ascending"), ("q", "ascending")])


def value_histogram(ds: "ray.data.Dataset", col: str, origin: float,
                    width: float) -> pa.Table:
    """Fixed-width histogram of ``col``: bin = floor((v - origin) /
    width), emitting only NON-EMPTY bins (matching ``GROUP BY
    floor((v - origin) / width)`` exactly — both sides compute the same
    double-precision expression, so bin assignment is bit-identical to
    the SQL oracle).

    Shape: per-batch np.bincount partials (each batch collapses to
    <= observed-bin-count rows), summed in a driver dict keyed by bin —
    driver state is bounded by the number of distinct bins (data-range
    / width, corpus-size-independent), never by row count.  No shuffle
    at all.  Returns (bin, lo_edge, n) sorted by bin.
    """
    if width <= 0:
        raise ValueError("width must be > 0")

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = batch.column(col).to_numpy().astype(np.float64)
        b = np.floor((v - origin) / width).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    acc: dict[int, int] = {}
    parts = ds.select_columns([col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for bn, n in zip(t.column("bin").to_pylist(),
                         t.column("n").to_pylist()):
            acc[bn] = acc.get(bn, 0) + n
    bins = sorted(acc)
    return pa.table({
        "bin": pa.array(bins, pa.int64()),
        "lo_edge": pa.array([round(origin + b * width, 6) for b in bins],
                            pa.float64()),
        "n": pa.array([acc[b] for b in bins], pa.int64())})


def exact_quantiles_cont(ds: "ray.data.Dataset", col: str,
                         qs: list[float], n_bins: int = 8192) -> pa.Table:
    """(q, value) rows — value is the INTERPOLATED quantile (SQL
    ``quantile_cont`` / ``percentile_cont``): with h = q·(n-1) over the
    sorted column v, value = v[⌊h⌋] + (h-⌊h⌋)·(v[⌈h⌉] - v[⌊h⌋]).

    Same three streaming passes as :func:`exact_quantiles` (scalar agg,
    fixed-width histogram, targeted bin fetch) — the fetch pass targets
    the up-to-two order statistics each q interpolates between, so the
    driver still sees ≈ n/n_bins values per needed bin, never a sort of
    the column."""
    from ray.data.aggregate import Count, Max, Min
    ds = ds.select_columns([col])
    agg = ds.aggregate(Count(), Min(col), Max(col))
    n = int(agg["count()"])
    qs_sorted = sorted(qs)
    out_q = pa.array(qs_sorted, pa.float64())
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    mn = float(agg[f"min({col})"])
    mx = float(agg[f"max({col})"])
    if mx == mn:
        return pa.table({"q": out_q,
                         "value": pa.array([round(mn, 6)] * len(qs_sorted),
                                           pa.float64())})
    pos = {q: q * (n - 1) for q in qs_sorted}
    ranks = sorted({r for p in pos.values()
                    for r in (int(math.floor(p)), int(math.ceil(p)))})

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy().astype(np.float64)
        c = np.bincount(_bin_index(v, mn, mx, n_bins), minlength=n_bins)
        nz = np.flatnonzero(c)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(c[nz], pa.int64())})

    counts = np.zeros(n_bins, np.int64)
    for b in ds.map_batches(_hist, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        np.add.at(counts, b.column("bin").to_numpy(),
                  b.column("cnt").to_numpy())
    cum = np.cumsum(counts)
    before = cum - counts
    need_bins: dict[int, list[int]] = {}
    for r in ranks:
        b = int(np.searchsorted(cum, r + 1))
        need_bins.setdefault(b, []).append(r)
    wanted = np.asarray(sorted(need_bins), np.int64)

    def _fetch(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy().astype(np.float64)
        idx = _bin_index(v, mn, mx, n_bins)
        m = np.isin(idx, wanted)
        return pa.table({col: pa.array(v[m], pa.float64()),
                         "bin": pa.array(idx[m], pa.int64())})

    got = pa.concat_tables(list(
        ds.map_batches(_fetch, batch_format="pyarrow",
                       zero_copy_batch=True).iter_batches(
                           batch_format="pyarrow")))
    vals = got.column(col).to_numpy()
    bins = got.column("bin").to_numpy()
    stat: dict[int, float] = {}
    for b, rlist in need_bins.items():
        inbin = np.sort(vals[bins == b])
        for r in rlist:
            stat[r] = float(inbin[r - int(before[b])])
    out_v = []
    for q in qs_sorted:
        h = pos[q]
        lo, hi = stat[int(math.floor(h))], stat[int(math.ceil(h))]
        out_v.append(round(lo + (h - math.floor(h)) * (hi - lo), 6))
    return pa.table({"q": out_q,
                     "value": pa.array(out_v, pa.float64())})
