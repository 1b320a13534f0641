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


def dim_stats(ds: "ray.data.Dataset", vec_col: str) -> pa.Table:
    """Per-dimension moments of a ``list<float>`` column — the
    explode-then-aggregate (SQL ``unnest`` + ``GROUP BY ord``) without
    ever materializing the exploded long form: each batch reduces to a
    (dim x 3) partial [n, sum, sumsq] via one reshape + column sums, so
    the driver state is dim x 3 floats regardless of corpus size.
    Emits (ord 1-based, n, mean_v, std_v) — std is the POPULATION
    stddev (``stddev_pop``), rounded to 6."""

    def _partial(batch: pa.Table) -> pa.Table:
        vecs = batch.column(vec_col)
        flat = np.asarray(vecs.combine_chunks().flatten().to_numpy(
            zero_copy_only=False), np.float64)
        n = batch.num_rows
        d = len(flat) // n if n else 0
        if n == 0 or d == 0:
            return pa.table({"ord": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "ss": pa.array([], pa.float64())})
        if len(flat) != n * d:
            raise ValueError("dim_stats requires fixed-length vectors; "
                             f"got {len(flat)} values / {n} rows")
        mat = flat.reshape(n, d)
        return pa.table({
            "ord": pa.array(np.arange(1, d + 1), pa.int64()),
            "n": pa.array(np.full(d, n, np.int64)),
            "s": pa.array(mat.sum(axis=0), pa.float64()),
            "ss": pa.array((mat * mat).sum(axis=0), pa.float64())})

    acc: dict[int, list] = {}
    for b in ds.select_columns([vec_col]).map_batches(
            _partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for o, n, s, ss in zip(b.column("ord").to_pylist(),
                               b.column("n").to_pylist(),
                               b.column("s").to_pylist(),
                               b.column("ss").to_pylist()):
            a = acc.setdefault(o, [0, 0.0, 0.0])
            a[0] += n
            a[1] += s
            a[2] += ss
    ords = sorted(acc)
    mean = [acc[o][1] / acc[o][0] for o in ords]
    std = [np.sqrt(max(0.0, acc[o][2] / acc[o][0] - m * m))
           for o, m in zip(ords, mean)]
    return pa.table({
        "ord": pa.array(ords, pa.int64()),
        "n": pa.array([acc[o][0] for o in ords], pa.int64()),
        "mean_v": pa.array([round(m, 6) for m in mean], pa.float64()),
        "std_v": pa.array([round(s, 6) for s in std], pa.float64())})


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
