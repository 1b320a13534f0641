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
