"""Vector-column aggregates: per-label centroids of an embedding
column (the building block for IVF retraining, class prototypes, and
embedding-drift monitoring).

Shape: each batch reduces to one (n_labels x dim) partial-sum matrix
+ count vector via np.add.at — the exchange to the driver is bounded
by labels x dim regardless of corpus size (same contract as
pivot_counts: unbounded label cardinality would make this a groupby,
not a centroid table)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def label_centroids(ds: "ray.data.Dataset", label_col: str,
                    vec_col: str) -> pa.Table:
    """(label, ord, v) long-form centroids: v = mean of component
    ``ord`` (1-based, matching SQL generate_subscripts) over all rows
    of the label; sorted (label, ord), rounded to 6."""

    def _partial(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        vecs = batch.column(vec_col)
        flat = np.asarray(vecs.combine_chunks().flatten().to_numpy(
            zero_copy_only=False), np.float64)
        n, d = len(labels), (len(flat) // max(1, len(labels))
                             if len(labels) else 0)
        if n == 0 or d == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "ord": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        if len(flat) != n * d:
            raise ValueError("label_centroids requires fixed-length "
                             f"vectors; got {len(flat)} values / {n} rows")
        mat = flat.reshape(n, d)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), np.float64)
        np.add.at(sums, inv, mat)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        k = len(uniq)
        return pa.table({
            "label": pa.array(np.repeat(uniq.astype(np.int64), d)),
            "s": pa.array(sums.ravel(), pa.float64()),
            "ord": pa.array(np.tile(np.arange(1, d + 1), k), pa.int64()),
            "cnt": pa.array(np.repeat(cnts, d), pa.int64())})

    acc_s: dict[tuple, float] = {}
    acc_n: dict[tuple, int] = {}
    for b in ds.select_columns([label_col, vec_col]).map_batches(
            _partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for lb, s, o, c in zip(b.column("label").to_pylist(),
                               b.column("s").to_pylist(),
                               b.column("ord").to_pylist(),
                               b.column("cnt").to_pylist()):
            acc_s[(lb, o)] = acc_s.get((lb, o), 0.0) + s
            acc_n[(lb, o)] = acc_n.get((lb, o), 0) + c
    keys = sorted(acc_s)
    return pa.table({
        "label": pa.array([k[0] for k in keys], pa.int64()),
        "ord": pa.array([k[1] for k in keys], pa.int64()),
        "v": pa.array([round(acc_s[k] / acc_n[k], 6) for k in keys],
                      pa.float64())})
