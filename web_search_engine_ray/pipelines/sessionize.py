"""Gap-based sessionization over an event stream — the windowed /
stateful-order operator of the suite (SURVEY.md §2.9-class extension).

Semantics: events of one user, ordered by ts, belong to the same
session while consecutive gaps are <= gap; a larger gap (or the first
event) opens a new session.  Implemented as a hash partition by
user_id + ONE fully-vectorized pass per partition (sort, run-boundary
detection, reduceat) — group size is bounded by per-user activity,
never corpus size, and there is no per-user Python call.  (A true
streaming variant would carry watermark state in an actor; batch
semantics suffice here.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)

GAP_US = 30 * 60 * 1_000_000  # 30 min


def _sessions_partition(batch: pa.Table, gap_us: int) -> pa.Table:
    """Per-user session stats for every complete user group in this
    hash partition, fully vectorized."""
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_sessions": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64()),
                      "max_session_events": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    uid = batch.column("user_id").to_numpy()
    ts = batch.column("ts").to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    order = np.lexsort((ts, uid))
    uid, ts = uid[order], ts[order]
    ustarts, uends = group_slices([uid])
    new_session = np.zeros(len(uid), dtype=bool)
    new_session[0] = True
    new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    new_session[ustarts] = True
    sess_id = np.cumsum(new_session) - 1
    sizes = np.bincount(sess_id)                       # per-session events
    ns_per_user = np.add.reduceat(new_session.astype(np.int64), ustarts)
    first_sess = np.concatenate(([0], np.cumsum(ns_per_user)[:-1]))
    max_sess = np.maximum.reduceat(sizes, first_sess)  # sessions contiguous/user
    return pa.table({
        "user_id": pa.array(uid[ustarts].astype(np.int64)),
        "n_sessions": pa.array(ns_per_user, pa.int64()),
        "n_events": pa.array((uends - ustarts).astype(np.int64)),
        "max_session_events": pa.array(max_sess.astype(np.int64)),
    })


def sessionize(events: "ray.data.Dataset", gap_us: int = GAP_US) -> pa.Table:
    out = hash_partition(events.select_columns(["user_id", "ts"]),
                         ["user_id"]) \
        .map_batches(_sessions_partition, fn_args=(gap_us,),
                     batch_size=None, batch_format="pyarrow",
                     zero_copy_batch=True)
    batches = list(out.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(batches) if batches else pa.table(
        {"user_id": pa.array([], pa.int64()),
         "n_sessions": pa.array([], pa.int64()),
         "n_events": pa.array([], pa.int64()),
         "max_session_events": pa.array([], pa.int64())})
    return tbl.sort_by([("user_id", "ascending")])
