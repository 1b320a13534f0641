"""Dataset profiling: one streaming pass computing per-column summary
statistics (the ``DESCRIBE`` a 100-TB curation run does before and
after every transform to sanity-check distributions).

Shape: each batch reduces to a |cols| x 6 partial matrix [n, n_null,
sum, sumsq, min, max]; the driver combine is |cols| x 6 floats
regardless of corpus size — no shuffle, no materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def profile_numeric(ds: "ray.data.Dataset", cols: list[str],
                    decimals: int = 6) -> pa.Table:
    """Long-form numeric profile: one row per column with (column,
    n, n_null, mean, std, min_v, max_v) — std is the POPULATION
    stddev; nulls are excluded from the moments, counted separately."""

    def _partial(batch: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            arr = batch.column(c)
            v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
            null = np.isnan(v)       # nulls surface as NaN in to_numpy
            ok = v[~null]
            rows.append((c, float(len(ok)), float(null.sum()),
                         float(ok.sum()), float((ok * ok).sum()),
                         float(ok.min()) if len(ok) else np.inf,
                         float(ok.max()) if len(ok) else -np.inf))
        return pa.table({
            "column": pa.array([r[0] for r in rows], pa.string()),
            "stat": pa.array([list(r[1:]) for r in rows],
                             pa.list_(pa.float64()))})

    acc: dict[str, np.ndarray] = {}
    for b in ds.select_columns(cols).map_batches(
            _partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for c, s in zip(b.column("column").to_pylist(),
                        b.column("stat").to_pylist()):
            s = np.asarray(s)
            if c in acc:
                a = acc[c]
                a[:4] += s[:4]
                a[4] = min(a[4], s[4])
                a[5] = max(a[5], s[5])
            else:
                acc[c] = s.copy()
    out = {"column": [], "n": [], "n_null": [], "mean": [], "std": [],
           "min_v": [], "max_v": []}
    for c in cols:                       # preserve caller column order
        n, nn, s, ss, lo, hi = acc[c]
        mean = s / n if n else float("nan")
        var = max(0.0, ss / n - mean * mean) if n else float("nan")
        out["column"].append(c)
        out["n"].append(int(n))
        out["n_null"].append(int(nn))
        out["mean"].append(round(mean, decimals))
        out["std"].append(round(float(np.sqrt(var)), decimals))
        out["min_v"].append(round(lo, decimals))
        out["max_v"].append(round(hi, decimals))
    return pa.table({
        "column": pa.array(out["column"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "n_null": pa.array(out["n_null"], pa.int64()),
        "mean": pa.array(out["mean"], pa.float64()),
        "std": pa.array(out["std"], pa.float64()),
        "min_v": pa.array(out["min_v"], pa.float64()),
        "max_v": pa.array(out["max_v"], pa.float64())})
