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
