"""Distinct-count operators: exact grouped count-distinct and an
HLL-style approximate sketch.

- ``count_distinct`` — exact count(distinct col) per key.  Per-batch
  combiner reduces each batch to its distinct (key, col) pairs, ONE
  hash exchange co-locates every copy of a pair in one partition
  (pairs are the partition key, so dedup-then-count per partition is
  exact), and the per-partition counts (n_keys rows each) sum in a
  final bounded pass.  The corpus itself is never shuffled — only
  distinct pairs.
- ``approx_distinct`` — HyperLogLog over an int64 column with a
  pinned splitmix64 hash: per-batch register partials (2^p bytes,
  corpus-size-independent), merged by elementwise max.  Deterministic
  (A.6: no process salt), mergeable across corpora, standard HLL
  accuracy (~1.04/sqrt(2^p)); the small-range regime uses linear
  counting.  Pinned by an error-bound pytest vs the exact count
  (no SQL oracle — the sketch is not SQL-expressible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from web_search_engine_ray.functions.grouping import hash_partition


def count_distinct(ds: "ray.data.Dataset", key: str, col: str,
                   num_partitions: int | None = None) -> pa.Table:
    """(key, n_distinct) — exact distinct ``col`` count per ``key``,
    sorted by key ascending."""
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key]

    def _pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: batch.column(key), col: batch.column(col)})
        t = pa.table({key: batch.column(key), col: batch.column(col)})
        g = pa.TableGroupBy(t, [key, col]).aggregate([])
        return g

    pairs = ds.select_columns([key, col]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True)

    def _count(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], key_type),
                             "n_distinct": pa.array([], pa.int64())})
        # the same pair may arrive once per source batch; dedup first
        d = pa.TableGroupBy(batch, [key, col]).aggregate([])
        g = pa.TableGroupBy(d, [key]).aggregate([([], "count_all")])
        return pa.table({key: g.column(key),
                         "n_distinct": g.column("count_all")})

    parts = list(hash_partition(pairs, [key, col], num_partitions)
                 .map_batches(_count, batch_size=None,
                              batch_format="pyarrow",
                              zero_copy_batch=True)
                 .iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table({key: pa.array([], key_type),
                         "n_distinct": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts, promote_options="default")
    g = pa.TableGroupBy(merged, [key]).aggregate([("n_distinct", "sum")])
    return pa.table({key: g.column(key),
                     "n_distinct": g.column("n_distinct_sum")}) \
        .sort_by([(key, "ascending")])


def distinct_rows(ds: "ray.data.Dataset", cols: list[str],
                  num_partitions: int | None = None) -> "ray.data.Dataset":
    """DISTINCT over ``cols``: per-batch distinct combiner (the
    exchange ships unique tuples per batch, not rows), one hash
    exchange on all columns, per-partition dedup — each tuple lives in
    exactly one partition, so the result is globally exact."""
    def _dedup(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(cols)
        return pa.TableGroupBy(batch.select(cols), cols).aggregate([])

    partial = ds.select_columns(cols).map_batches(
        _dedup, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition(partial, cols, num_partitions).map_batches(
        _dedup, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Pinned vectorized 64-bit finalizer (public-domain splitmix64)."""
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def approx_distinct(ds: "ray.data.Dataset", col: str,
                    p: int = 14) -> int:
    """HLL estimate of count(distinct col) for an integer column."""
    m = 1 << p

    def _registers(batch: pa.Table) -> pa.Table:
        regs = np.zeros(m, np.uint8)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        if len(v):
            h = _splitmix64(np.asarray(v, np.int64))
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
            # rank = leading zeros of the remaining 64-p bits, + 1
            lz = np.zeros(len(rest), np.uint8)
            cur = rest
            for shift in (32, 16, 8, 4, 2, 1):
                mask = cur < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += shift
                cur = np.where(mask, cur << np.uint64(shift), cur)
            rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
            np.maximum.at(regs, idx, rank)
        return pa.table({"reg": pa.array(regs, pa.uint8()),
                         "slot": pa.array(np.arange(m), pa.int64())})

    regs = np.zeros(m, np.uint8)
    for b in ds.select_columns([col]).map_batches(
            _registers, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        slot = b.column("slot").to_numpy()
        np.maximum.at(regs, slot, b.column("reg").to_numpy())
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # linear counting regime
    return int(round(est))
