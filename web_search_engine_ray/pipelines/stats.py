"""Grouped statistical aggregates built on streaming moment partials.

Shape (shared with reference_queries.events_corr): each batch reduces
to a per-key [n, Σx, Σy, Σxx, Σyy, Σxy] moment matrix via one
dictionary-encode + np.add.at — the driver combine is |keys| x 6
floats regardless of corpus size.  Keys with unbounded cardinality
should go through a hash exchange instead (mode_by_key pattern); the
pinned queries use low-cardinality keys (event types).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _grouped_moments(ds: "ray.data.Dataset", key: str, x_col: str,
                     y_col: str) -> dict[str, np.ndarray]:
    def _mom(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        x = batch.column(x_col).to_numpy().astype(np.float64)
        y = batch.column(y_col).to_numpy().astype(np.float64)
        enc = pc.dictionary_encode(batch.column(key)).combine_chunks()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        kdict = enc.dictionary.to_pylist()
        m = np.zeros((len(kdict), 6))
        np.add.at(m, codes, np.stack(
            [np.ones_like(x), x, y, x * x, y * y, x * y], axis=1))
        return pa.table({
            key: pa.array(kdict),
            "mom": pa.array(list(m), pa.list_(pa.float64()))})

    acc: dict[str, np.ndarray] = {}
    out = ds.select_columns([key, x_col, y_col]).map_batches(
        _mom, batch_format="pyarrow", zero_copy_batch=True)
    for t in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for k, m in zip(t.column(key).to_pylist(),
                        t.column("mom").to_pylist()):
            acc[k] = acc.get(k, np.zeros(6)) + np.asarray(m)
    return acc


def grouped_linreg(ds: "ray.data.Dataset", key: str, x_col: str,
                   y_col: str, decimals: int = 6) -> pa.Table:
    """Per-key ordinary-least-squares fit of y on x — the SQL
    ``regr_slope(y, x)`` / ``regr_intercept(y, x)`` / ``regr_r2``
    aggregates: slope = cov(x,y)/var(x), intercept = ȳ − slope·x̄,
    r2 = corr².  One streaming moments pass; emits (key, n_pts,
    slope, intercept, r2) sorted by key, rounded to ``decimals``."""
    acc = _grouped_moments(ds, key, x_col, y_col)
    keys = sorted(acc)
    rows = {"slope": [], "intercept": [], "r2": [], "n": []}
    for k in keys:
        n, sx, sy, sxx, syy, sxy = acc[k]
        cov = sxy - sx * sy / n
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        slope = cov / vx
        rows["slope"].append(round(slope, decimals))
        rows["intercept"].append(round((sy - slope * sx) / n, decimals))
        rows["r2"].append(round(cov * cov / (vx * vy), decimals))
        rows["n"].append(int(n))
    return pa.table({
        key: pa.array(keys),
        "n_pts": pa.array(rows["n"], pa.int64()),
        "slope": pa.array(rows["slope"], pa.float64()),
        "intercept": pa.array(rows["intercept"], pa.float64()),
        "r2": pa.array(rows["r2"], pa.float64())})


def grouped_weighted_mean(ds: "ray.data.Dataset", key: str, val_col: str,
                          weight_col: str, decimals: int = 6) -> pa.Table:
    """Per-key weighted mean Σ(v·w)/Σ(w) — the SQL
    ``sum(v*w)/sum(w)`` — from the same streaming moments pass as
    grouped_linreg (the Σxy and Σy slots).  Emits (key, n_pts,
    wmean) sorted by key."""
    acc = _grouped_moments(ds, key, val_col, weight_col)
    keys = sorted(acc)
    return pa.table({
        key: pa.array(keys),
        "n_pts": pa.array([int(acc[k][0]) for k in keys], pa.int64()),
        "wmean": pa.array([round(acc[k][5] / acc[k][2], decimals)
                           for k in keys], pa.float64())})


def vector_cov(ds: "ray.data.Dataset", vec_col: str, dims: int,
               decimals: int = 6) -> pa.Table:
    """Upper-triangle POPULATION covariance matrix of the first
    ``dims`` components of a ``list<float>`` column — the streaming
    Gram-matrix pass (each batch reduces to one dims x dims X^T X
    partial + a column-sum vector; driver state is dims² floats).
    Emits (di, dj, cov) with 1-based di <= dj, sorted."""

    def _partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.flatten().to_numpy(zero_copy_only=False),
                          np.float64)
        n = batch.num_rows
        d = len(flat) // n if n else 0
        if n == 0 or d < dims:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "g": pa.array([], pa.list_(pa.float64()))})
        x = flat.reshape(n, d)[:, :dims]
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "g": pa.array([(x.T @ x).ravel().tolist()],
                          pa.list_(pa.float64()))})

    n_tot, s_tot, g_tot = 0, np.zeros(dims), np.zeros(dims * dims)
    for b in ds.select_columns([vec_col]).map_batches(
            _partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for n, s, g in zip(b.column("n").to_pylist(),
                           b.column("s").to_pylist(),
                           b.column("g").to_pylist()):
            n_tot += n
            s_tot += np.asarray(s)
            g_tot += np.asarray(g)
    mean = s_tot / n_tot
    cov = g_tot.reshape(dims, dims) / n_tot - np.outer(mean, mean)
    iu, ju = np.triu_indices(dims)
    return pa.table({
        "di": pa.array((iu + 1).astype(np.int64)),
        "dj": pa.array((ju + 1).astype(np.int64)),
        "cov": pa.array(np.round(cov[iu, ju], decimals), pa.float64())})
