"""asof_join / hopping_window_agg (pipelines/temporal.py) vs DuckDB on
seeded synthetic streams — inclusive-bound ties (left.ts == right.ts),
keys missing on either side, partition-count invariance, and the
tumbling degenerate case (window == slide)."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.pipelines.temporal import (asof_join,
                                                      hopping_window_agg)


def _streams(seed=11, n_l=800, n_r=600, n_keys=40):
    g = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    lts = base + g.integers(0, 10**9, n_l).astype("timedelta64[us]")
    rts = base + g.integers(0, 10**9, n_r).astype("timedelta64[us]")
    # plant exact ts collisions across sides (inclusive bound) and
    # keys that exist on only one side
    lts[:20] = rts[:20]
    left = pa.table({
        "uid": pa.array(g.integers(0, n_keys, n_l), pa.int64()),
        "ts": pa.array(lts, pa.timestamp("us")),
        "lval": pa.array(g.uniform(0, 10, n_l)),
    })
    right = pa.table({
        "uid": pa.array(g.integers(5, n_keys + 5, n_r), pa.int64()),
        "ts": pa.array(rts, pa.timestamp("us")),
        "rval": pa.array(g.uniform(0, 10, n_r)),
    })
    return left, right


def _collect(ds) -> pa.Table:
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                         promote_options="default")
    return t.sort_by([(c, "ascending") for c in ("uid", "ts", "lval")])


def _duck_asof(left, right):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql("""
        SELECT l.uid, l.ts, l.lval, r.rval
        FROM l ASOF JOIN r ON l.uid = r.uid AND l.ts >= r.ts
        ORDER BY l.uid, l.ts, l.lval""").arrow()


def test_asof_vs_duckdb(ray_session):
    left, right = _streams()
    got = _collect(asof_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(3),
        key="uid", ts_col="ts", value_cols=["rval"]))
    want = _duck_asof(left, right)
    assert got.column("uid").to_pylist() == want.column("uid").to_pylist()
    assert got.column("ts").to_pylist() == want.column("ts").to_pylist()
    assert np.allclose(got.column("rval").to_numpy(),
                       want.column("rval").to_numpy())


def test_asof_partition_invariance(ray_session):
    left, right = _streams(seed=12)
    a = _collect(asof_join(ray.data.from_arrow(left),
                           ray.data.from_arrow(right),
                           key="uid", ts_col="ts", value_cols=["rval"],
                           num_partitions=1))
    b = _collect(asof_join(ray.data.from_arrow(left).repartition(9),
                           ray.data.from_arrow(right).repartition(7),
                           key="uid", ts_col="ts", value_cols=["rval"],
                           num_partitions=13))
    assert a.to_pydict() == b.to_pydict()


def test_asof_inclusive_tie(ray_session):
    left = pa.table({"uid": pa.array([1], pa.int64()),
                     "ts": pa.array([np.datetime64("2024-01-01", "us")],
                                    pa.timestamp("us")),
                     "lval": pa.array([1.0])})
    right = pa.table({"uid": pa.array([1, 1], pa.int64()),
                      "ts": pa.array([np.datetime64("2024-01-01", "us"),
                                      np.datetime64("2024-01-02", "us")],
                                     pa.timestamp("us")),
                      "rval": pa.array([7.0, 9.0])})
    got = _collect(asof_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             key="uid", ts_col="ts", value_cols=["rval"]))
    # equal ts qualifies (inclusive); the later right row does not
    assert got.column("rval").to_pylist() == [7.0]


def test_asof_no_match_drops(ray_session):
    left, right = _streams(seed=13)
    # uid 0..4 never appear on the right (right uids start at 5)
    got = _collect(asof_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             key="uid", ts_col="ts", value_cols=["rval"]))
    assert set(got.column("uid").to_pylist()).isdisjoint(range(5))


def _duck_hop(t, w_us, s_us):
    con = duckdb.connect()
    con.register("ev", t)
    return con.sql(f"""
        SELECT make_timestamp(k * {s_us}) AS window_start, etype,
               round(sum(v), 6) AS sum_value, count(*) AS n
        FROM (SELECT etype, v, unnest(generate_series(
                (epoch_us(ts) - {w_us}) // {s_us} + 1,
                epoch_us(ts) // {s_us})) AS k FROM ev)
        GROUP BY 1, 2 ORDER BY 1, 2""").arrow()


def _hop_events(seed=21, n=3000):
    g = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    return pa.table({
        "ts": pa.array(base + g.integers(0, 86400 * 10**6, n)
                       .astype("timedelta64[us]"), pa.timestamp("us")),
        "etype": pa.array(g.choice(["a", "b", "c"], n)),
        "v": pa.array(g.uniform(0, 5, n)),
    })


def test_hopping_vs_duckdb(ray_session):
    t = _hop_events()
    w, s = 3_600_000_000, 900_000_000
    got = hopping_window_agg(ray.data.from_arrow(t).repartition(6),
                             "ts", "etype", "v", w, s)
    gt = pa.concat_tables(list(got.iter_batches(batch_format="pyarrow"))) \
        .sort_by([("window_start", "ascending"), ("etype", "ascending")])
    assert gt.to_pydict() == _duck_hop(t, w, s).to_pydict()


def test_hopping_tumbling_degenerate(ray_session):
    t = _hop_events(seed=22, n=1000)
    w = s = 3_600_000_000
    got = hopping_window_agg(ray.data.from_arrow(t), "ts", "etype",
                             "v", w, s)
    gt = pa.concat_tables(list(got.iter_batches(batch_format="pyarrow"))) \
        .sort_by([("window_start", "ascending"), ("etype", "ascending")])
    assert gt.to_pydict() == _duck_hop(t, w, s).to_pydict()
    # every row lands in exactly one window
    assert int(np.sum(gt.column("n").to_numpy())) == 1000


def test_hopping_rejects_non_multiple(ray_session):
    import pytest
    t = _hop_events(seed=23, n=10)
    with pytest.raises(ValueError):
        hopping_window_agg(ray.data.from_arrow(t), "ts", "etype", "v",
                           1000, 300)
