"""Analytic window operators (pipelines/analytic.py) + left outer hash
join vs DuckDB window/join SQL on seeded synthetic streams — duplicate
timestamps (the id tie-break), single-row keys, lead vs lag, and
partition-count invariance."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.functions.grouping import hash_join
from web_search_engine_ray.pipelines.analytic import running_sum, shift_by_key


def _events(seed=5, n=1200, n_keys=30):
    g = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01", "us")
    ts = base + g.integers(0, 10**8, n).astype("timedelta64[us]")
    ts[50:60] = ts[40:50]          # planted duplicate timestamps
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(g.integers(0, n_keys, n), pa.int64()),
        "value": pa.array(g.uniform(0, 10, n)),
    })


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                            promote_options="default") \
        .sort_by("event_id")


def test_running_sum_vs_duckdb(ray_session):
    tbl = _events()
    con = duckdb.connect()
    con.register("ev", tbl)
    want = con.sql("""
        SELECT event_id, user_id,
               round(sum(value) OVER w, 6) AS running_sum,
               CAST(row_number() OVER w AS BIGINT) AS running_n
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
        ORDER BY event_id""").arrow()
    for nparts in (1, 4):
        got = _collect(running_sum(
            ray.data.from_arrow(tbl).repartition(6), key="user_id",
            ts_col="ts", val_col="value", id_col="event_id",
            num_partitions=nparts))
        assert got.column("event_id").to_pylist() == \
            want.column("event_id").to_pylist()
        assert got.column("running_n").to_pylist() == \
            want.column("running_n").to_pylist()
        assert np.allclose(got.column("running_sum").to_numpy(),
                           want.column("running_sum").to_numpy(),
                           atol=1e-6, rtol=0)


def test_shift_lag_and_lead_vs_duckdb(ray_session):
    tbl = _events(seed=9, n=600, n_keys=12)
    con = duckdb.connect()
    con.register("ev", tbl)
    for offset, fn in ((1, "lag"), (-1, "lead"), (2, "lag")):
        k = abs(offset)
        want = con.sql(f"""
            SELECT event_id,
                   {fn}(value, {k}) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS sv
            FROM ev ORDER BY event_id""").arrow()
        got = _collect(shift_by_key(
            ray.data.from_arrow(tbl).repartition(4), key="user_id",
            ts_col="ts", shift_col="value", id_col="event_id",
            offset=offset, out_col="sv"))
        assert got.column("sv").to_pylist() == want.column("sv").to_pylist()


def test_shift_single_row_keys_all_null(ray_session):
    tbl = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array(np.array([1, 2, 3], "datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    got = _collect(shift_by_key(
        ray.data.from_arrow(tbl), key="user_id", ts_col="ts",
        shift_col="value", id_col="event_id", offset=1))
    assert got.column("lag_value").null_count == 3


def test_left_join_vs_duckdb(ray_session):
    g = np.random.default_rng(3)
    left = pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                     "lv": pa.array(g.uniform(0, 1, 50))})
    right = pa.table({"k": pa.array(g.integers(0, 30, 80), pa.int64()),
                      "rv": pa.array(np.arange(80, dtype=np.int64))})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("""SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r USING (k)
                      ORDER BY k, rv""").arrow()
    out = hash_join(ray.data.from_arrow(left).repartition(3),
                    ray.data.from_arrow(right).repartition(2),
                    on="k", how="left")
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")),
                           promote_options="default") \
        .sort_by([("k", "ascending"), ("rv", "ascending")])
    assert got.column("k").to_pylist() == want.column("k").to_pylist()
    assert got.column("rv").to_pylist() == want.column("rv").to_pylist()
    # keys absent from the right side: present exactly once with null rv
    expect_unmatched = sorted(set(range(50))
                              - set(right.column("k").to_pylist()))
    unmatched = got.filter(pa.compute.is_null(got.column("rv")))
    assert unmatched.column("k").to_pylist() == expect_unmatched
    assert set(range(30, 50)) <= set(expect_unmatched)


def test_rolling_mean_vs_duckdb(ray_session):
    from web_search_engine_ray.pipelines.analytic import rolling_mean
    tbl = _events(seed=21, n=900, n_keys=20)
    con = duckdb.connect()
    con.register("ev", tbl)
    want = con.sql("""
        SELECT event_id,
               round(avg(value) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS rm
        FROM ev ORDER BY event_id""").arrow()
    got = _collect(rolling_mean(
        ray.data.from_arrow(tbl).repartition(5), key="user_id",
        ts_col="ts", val_col="value", id_col="event_id", window_rows=4))
    assert np.allclose(got.column("rolling_mean").to_numpy(),
                       want.column("rm").to_numpy(), atol=1e-6, rtol=0)
    # window_rows=1 degenerates to the value itself
    got1 = _collect(rolling_mean(
        ray.data.from_arrow(tbl), key="user_id", ts_col="ts",
        val_col="value", id_col="event_id", window_rows=1)) \
        .sort_by("event_id")
    base = tbl.sort_by("event_id")
    assert np.allclose(got1.column("rolling_mean").to_numpy(),
                       np.round(base.column("value").to_numpy(), 6),
                       atol=1e-9)


def test_rank_in_key_vs_duckdb(ray_session):
    from web_search_engine_ray.pipelines.analytic import rank_in_key
    g = np.random.default_rng(11)
    n = 1500
    # small integer score domain => heavy ties, so rank / dense_rank /
    # row_number genuinely diverge
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(g.integers(0, 25, n), pa.int64()),
        "score": pa.array(g.integers(0, 12, n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("ev", tbl)
    for desc, d_sql in ((True, "DESC"), (False, "ASC")):
        want = con.sql(f"""
            SELECT event_id, user_id, score,
                   CAST(row_number() OVER (PARTITION BY user_id
                        ORDER BY score {d_sql}, event_id) AS BIGINT)
                     AS row_num,
                   CAST(rank() OVER (PARTITION BY user_id
                        ORDER BY score {d_sql}) AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER (PARTITION BY user_id
                        ORDER BY score {d_sql}) AS BIGINT) AS dense_rnk
            FROM ev ORDER BY event_id""").arrow()
        for nparts in (1, 4):
            got = _collect(rank_in_key(
                ray.data.from_arrow(tbl).repartition(6), key="user_id",
                order_col="score", id_col="event_id", descending=desc,
                num_partitions=nparts))
            for col in ("event_id", "user_id", "score", "row_num",
                        "rnk", "dense_rnk"):
                assert got.column(col).to_pylist() == \
                    want.column(col).to_pylist(), (col, desc, nparts)
