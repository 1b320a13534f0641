"""Gap-based sessionization over an event stream — the windowed /
stateful-order operator of the suite (SURVEY.md §2.9-class extension).

Semantics: events of one user, ordered by ts, belong to the same
session while consecutive gaps are <= gap; a larger gap (or the first
event) opens a new session.  Implemented as a hash-partitioned
``groupby(user).map_groups`` with a vectorized in-group gap scan —
per-group payload is one user's events, so group size is bounded by
per-user activity, never corpus size.  (A true streaming variant would
carry watermark state in an actor; batch semantics suffice here.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

GAP_US = 30 * 60 * 1_000_000  # 30 min


def _sessions_for_user(group: pa.Table, gap_us: int) -> pa.Table:
    uid = group.column("user_id")[0].as_py()
    ts = np.sort(group.column("ts").to_numpy().astype("datetime64[us]")
                 .astype(np.int64))
    new_session = np.empty(len(ts), dtype=bool)
    new_session[0] = True
    np.greater(np.diff(ts), gap_us, out=new_session[1:])
    n_sessions = int(new_session.sum())
    # longest session length in events
    bounds = np.flatnonzero(new_session)
    sizes = np.diff(np.concatenate((bounds, [len(ts)])))
    return pa.table({
        "user_id": pa.array([uid], pa.int64()),
        "n_sessions": pa.array([n_sessions], pa.int64()),
        "n_events": pa.array([len(ts)], pa.int64()),
        "max_session_events": pa.array([int(sizes.max())], pa.int64()),
    })


def sessionize(events: "ray.data.Dataset", gap_us: int = GAP_US) -> pa.Table:
    out = events.select_columns(["user_id", "ts"]) \
        .groupby("user_id") \
        .map_groups(_sessions_for_user, fn_args=(gap_us,),
                    batch_format="pyarrow")
    batches = list(out.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(batches) if batches else pa.table(
        {"user_id": pa.array([], pa.int64()),
         "n_sessions": pa.array([], pa.int64()),
         "n_events": pa.array([], pa.int64()),
         "max_session_events": pa.array([], pa.int64())})
    return tbl.sort_by([("user_id", "ascending")])
