"""Hash-partition + vectorized run-detection helpers — the cheap
replacement for ``groupby().map_groups()`` whose per-group Python call
dominates when groups are numerous and tiny (measured 7.4 s vs <1 s on
160k LSH bucket rows).

Pattern: ``_hash_partition(ds, keys)`` co-locates complete key groups
per block; a follow-up ``map_batches(fn, batch_size=None)`` sees whole
partitions and detects group runs with ``group_slices`` after one sort.
"""

from __future__ import annotations

import numpy as np

import ray
import ray.data


def hash_partition(ds: "ray.data.Dataset", keys: list[str],
                   num_partitions: int | None = None) -> "ray.data.Dataset":
    """Hash-partition by keys so a follow-up map_batches(batch_size=None)
    sees complete key groups per block.

    INVARIANT (correctness, not just perf): every consumer of this
    helper (dedup first-rows, LSH bucket pairing, sessionize, window
    ops) requires that all rows of a key land in ONE output block.  Ray
    2.49's HASH_SHUFFLE emits exactly ``num_partitions`` blocks — one
    per hash partition — and does NOT split an oversized partition at
    ``target_max_block_size`` (verified empirically with a hot key 6x
    over the target; pinned by tests/test_grouping_invariant.py so a
    Ray upgrade that starts splitting fails loudly instead of silently
    dropping pairs).  The flip side: a partition must fit in a worker's
    heap — size ``num_partitions`` UP for skewed/huge inputs rather
    than relying on block-size capping, and salt hot keys upstream when
    one key alone outgrows a worker.
    """
    from ray.data.context import ShuffleStrategy
    n = max(1, int(ray.cluster_resources().get("CPU", 4)))
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.max_hash_shuffle_aggregators = max(2, n // 4)
    return ds.repartition(num_blocks=num_partitions or max(4, n // 2),
                          keys=keys)


def group_slices(sort_cols: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs in already-sorted parallel arrays."""
    n = len(sort_cols[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    diff = np.zeros(n - 1, dtype=bool)
    for c in sort_cols:
        diff |= c[1:] != c[:-1]
    change = np.flatnonzero(diff) + 1
    return np.r_[0, change].astype(np.int64), \
        np.r_[change, n].astype(np.int64)


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str, num_partitions: int | None = None,
              suffix: str = "_r", how: str = "inner") -> "ray.data.Dataset":
    """Hash join (``how`` = "inner" | "left" | "full"; "left" is LEFT
    OUTER — left rows with no match keep null right columns; "full" is
    FULL OUTER — unmatched rows from EITHER side survive with the other
    side's columns null and the key coalesced) as ONE exchange: tag
    each side, union, hash-partition on the key, then a per-partition
    pyarrow (acero) join.

    Exists because Dataset.join's aggregator crashes on EMPTY hash
    partitions (pyarrow FieldRef "no match" on a schemaless block) —
    inevitable when a small side meets num_partitions > distinct keys.
    This form tolerates empty partitions (each side's sub-table always
    carries its schema) and reuses the repo's hash_partition contract.
    Right-side non-key columns colliding with left names get
    ``suffix``.  Row order is not defined (hash-partitioned), as with
    any shuffle join.
    """
    import pyarrow as pa

    if how not in ("inner", "left", "full"):
        raise ValueError(
            f"how must be 'inner', 'left' or 'full', got {how!r}")
    join_type = {"inner": "inner", "left": "left outer",
                 "full": "full outer"}[how]
    ls, rs = left.schema(), right.schema()
    if on not in ls.names or on not in rs.names:
        raise ValueError(f"join key {on!r} missing: {ls.names} / {rs.names}")
    l_only = [n for n in ls.names if n != on]
    r_only = [n for n in rs.names if n != on]
    ren = {n: (n + suffix if n in ls.names else n) for n in r_only}
    l_types = dict(zip(ls.names, ls.types))
    r_types = dict(zip(rs.names, rs.types))
    out_names = [on] + l_only + [ren[n] for n in r_only]

    def _pad(side: int):
        def pad(b: "pa.Table") -> "pa.Table":
            n = b.num_rows
            cols = {on: b.column(on)}
            for c in l_only:
                cols[c] = b.column(c) if side == 0 else pa.nulls(
                    n, l_types[c])
            for c in r_only:
                cols[ren[c]] = pa.nulls(n, r_types[c]) if side == 0 \
                    else b.column(c)
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols)
        return pad

    u = left.map_batches(_pad(0), batch_format="pyarrow",
                         zero_copy_batch=True).union(
        right.map_batches(_pad(1), batch_format="pyarrow",
                          zero_copy_batch=True))

    def _merge(b: "pa.Table") -> "pa.Table":
        side = b.column("__side").to_numpy()
        lt = b.filter(pa.array(side == 0)).select([on] + l_only)
        rt = b.filter(pa.array(side == 1)).select(
            [on] + [ren[c] for c in r_only])
        return lt.join(rt, keys=on, join_type=join_type).select(out_names)

    return hash_partition(u, [on], num_partitions).map_batches(
        _merge, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def _existence_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                    on: str, keep_matched: bool,
                    num_partitions: int | None) -> "ray.data.Dataset":
    """Shared semi/anti machinery: the right side is reduced to its
    per-batch DISTINCT keys (combiner — the exchange ships keys, not
    rows), both sides co-partition in one tagged-union exchange, and
    each partition keeps left rows whose key is (semi) / is not (anti)
    in the partition's right-key set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ls = left.schema()
    if on not in ls.names or on not in right.schema().names:
        raise ValueError(f"join key {on!r} missing")
    l_cols = [n for n in ls.names if n != on]
    l_types = dict(zip(ls.names, ls.types))

    def _pad(side: int):
        def pad(b: pa.Table) -> pa.Table:
            if side == 1:   # combiner: distinct keys only
                b = pa.TableGroupBy(pa.table({on: b.column(on)}),
                                    [on]).aggregate([])
            n = b.num_rows
            cols = {on: b.column(on)}
            for c in l_cols:
                cols[c] = b.column(c) if side == 0 else pa.nulls(
                    n, l_types[c])
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols)
        return pad

    u = left.map_batches(_pad(0), batch_format="pyarrow",
                         zero_copy_batch=True).union(
        right.map_batches(_pad(1), batch_format="pyarrow",
                          zero_copy_batch=True))

    def _keep(b: pa.Table) -> pa.Table:
        side = b.column("__side").to_numpy()
        lt = b.filter(pa.array(side == 0)).select([on] + l_cols)
        rkeys = b.filter(pa.array(side == 1)).column(on)
        if rkeys.num_chunks == 0 or len(rkeys) == 0:
            hit = pa.array(np.zeros(lt.num_rows, bool))
        else:
            # EXISTS-style equality never matches NULL: skip_nulls=True
            # ignores a null right key, and a null LEFT key must come
            # out False (kept by anti, dropped by semi) — the default
            # options made it null/true and Table.filter then dropped
            # the row on BOTH paths.
            hit = pc.is_in(lt.column(on), options=pc.SetLookupOptions(
                value_set=rkeys.combine_chunks(), skip_nulls=True))
        hit = pc.fill_null(hit, False)
        mask = hit if keep_matched else pc.invert(hit)
        return lt.filter(mask)

    return hash_partition(u, [on], num_partitions).map_batches(
        _keep, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def semi_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str, num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """Left rows whose key appears on the right (right dedup'd)."""
    return _existence_join(left, right, on, True, num_partitions)


def anti_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str, num_partitions: int | None = None
              ) -> "ray.data.Dataset":
    """Left rows whose key does NOT appear on the right."""
    return _existence_join(left, right, on, False, num_partitions)


def broadcast_join(left: "ray.data.Dataset", small: "pa.Table", on: str,
                   suffix: str = "_r",
                   how: str = "inner") -> "ray.data.Dataset":
    """Map-side (broadcast) join: the SMALL side is ``ray.put`` into
    the object store ONCE and every map task joins its batch against
    the shared copy — zero shuffle of the big side, the standard plan
    for fact x dimension joins at scale (a hash exchange of the fact
    table to meet a kilobyte dimension is pure waste).

    ``how`` = "inner" | "left" (left outer).  Small-side non-key
    columns colliding with left names get ``suffix``.  The small side
    must fit in a worker's heap — that is the operator's contract;
    use :func:`hash_join` when both sides are large."""
    import pyarrow as pa

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    join_type = "inner" if how == "inner" else "left outer"
    lnames = left.schema().names
    if on not in lnames or on not in small.schema.names:
        raise ValueError(f"join key {on!r} missing: "
                         f"{lnames} / {small.schema.names}")
    ren = {n: (n + suffix if n in lnames else n)
           for n in small.schema.names if n != on}
    small = small.select([on] + list(ren)).rename_columns(
        [on] + [ren[n] for n in ren])
    small_ref = ray.put(small)
    out_names = lnames + [ren[n] for n in ren]

    class _Join:
        def __init__(self):
            # one object-store fetch per ACTOR, shared across batches
            self.small = ray.get(small_ref)

        def __call__(self, batch: "pa.Table") -> "pa.Table":
            return batch.join(self.small, keys=on,
                              join_type=join_type).select(out_names)

    return left.map_batches(_Join, batch_format="pyarrow",
                            zero_copy_batch=True,
                            concurrency=(1, 8))
