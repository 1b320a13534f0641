"""Round-5 session-3 additions: FULL OUTER hash join, per-key
first/last value, group_topk blockwise pre-prune exactness, SUM pivot
+ unpivot (melt), per-dimension vector moments, cohort analytics
(new-users, retention), and grouped OLS regression — each vs DuckDB
(or a numpy reference) on seeded synthetic data, across block splits
so combiner/exchange paths are exercised, not just single-batch
shortcuts."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.functions.grouping import hash_join
from web_search_engine_ray.pipelines.cohort import (new_users_per_day,
                                                    retention_matrix)
from web_search_engine_ray.pipelines.relational import pivot_sum, unpivot
from web_search_engine_ray.pipelines.stats import grouped_linreg
from web_search_engine_ray.pipelines.vectors import dim_stats
from web_search_engine_ray.pipelines.window import (first_last_by_key,
                                                    group_topk)


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                            promote_options="default")


def _events(seed=7, n=1200, n_keys=19):
    g = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01", "us")
    ts = base + g.integers(0, 20 * 86_400_000_000, n) \
        .astype("timedelta64[us]")
    ts[50:60] = ts[40:50]          # duplicate timestamps -> id tie-break
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(g.integers(0, n_keys, n), pa.int64()),
        "event_type": pa.array(
            g.choice(["a", "b", "c"], n).tolist(), pa.string()),
        "value": pa.array(np.round(g.uniform(-10, 10, n), 3)),
    })


def _split_ds(tbl: pa.Table, n_blocks: int = 7):
    """Multi-block dataset so per-block combiners see partial groups."""
    step = max(1, tbl.num_rows // n_blocks)
    return ray.data.from_arrow(
        [tbl.slice(i, step) for i in range(0, tbl.num_rows, step)])


def test_full_outer_join_vs_duckdb(ray_session):
    g = np.random.default_rng(3)
    left = pa.table({"k": pa.array(g.integers(0, 40, 60), pa.int64()),
                     "a": pa.array(np.arange(60, dtype=np.int64))})
    right = pa.table({"k": pa.array(g.integers(20, 60, 60), pa.int64()),
                      "b": pa.array(np.arange(60, 120, dtype=np.int64))})
    got = _collect(hash_join(_split_ds(left, 4), _split_ds(right, 3),
                             on="k", how="full")) \
        .sort_by([("k", "ascending"), ("a", "ascending"),
                  ("b", "ascending")])
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql("""
        SELECT COALESCE(l.k, r.k) AS k, a, b
        FROM l FULL OUTER JOIN r ON l.k = r.k
        ORDER BY k, a NULLS LAST, b NULLS LAST""").arrow()
    assert got.num_rows == want.num_rows
    for c in ("k", "a", "b"):
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_full_outer_empty_side(ray_session):
    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "a": pa.array([10, 20], pa.int64())})
    right = pa.table({"k": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    got = _collect(hash_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             on="k", how="full")).sort_by("k")
    assert got.column("k").to_pylist() == [1, 2]
    assert got.column("b").to_pylist() == [None, None]


def test_first_last_vs_duckdb(ray_session):
    tbl = _events()
    got = _collect(first_last_by_key(
        _split_ds(tbl), key="user_id", ts_col="ts", val_col="value",
        id_col="event_id")).sort_by("user_id")
    con = duckdb.connect()
    con.register("ev", tbl)
    want = con.sql("""
        SELECT user_id,
               first(value ORDER BY ts, event_id) AS first_val,
               last(value ORDER BY ts, event_id) AS last_val
        FROM ev GROUP BY user_id ORDER BY user_id""").arrow()
    assert got.equals(want)


def test_group_topk_pruned_matches_bruteforce(ray_session):
    tbl = _events(seed=13, n=800, n_keys=11)
    # planted order-value ties so the id tie-break decides membership
    v = tbl.column("value").to_numpy().copy()
    v[200:260] = 5.0
    tbl = tbl.set_column(tbl.schema.get_field_index("value"), "value",
                         pa.array(v))
    got = group_topk(_split_ds(tbl, 9), key="user_id", order_col="value",
                     k=4, id_col="event_id")
    con = duckdb.connect()
    con.register("ev", tbl)
    want = con.sql("""
        SELECT * FROM (
          SELECT event_id, user_id, value,
                 CAST(row_number() OVER (PARTITION BY user_id
                      ORDER BY value DESC, event_id) AS INT) AS rank
          FROM ev) WHERE rank <= 4
        ORDER BY user_id, rank""").arrow()
    assert got.column("event_id").to_pylist() == \
        want.column("event_id").to_pylist()
    assert got.column("rank").to_pylist() == want.column("rank").to_pylist()


def test_pivot_sum_vs_pandas(ray_session):
    tbl = _events()
    got = pivot_sum(_split_ds(tbl), row_key="user_id",
                    col_key="event_type", value_col="value",
                    categories=["a", "b", "c"])
    df = tbl.to_pandas()
    piv = df.pivot_table(index="user_id", columns="event_type",
                         values="value", aggfunc="sum",
                         fill_value=0.0).round(6)
    for cat in ("a", "b", "c"):
        assert np.allclose(got.column(cat).to_numpy(),
                           piv[cat].to_numpy(), atol=1e-9), cat


def test_unpivot_roundtrip(ray_session):
    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "x": pa.array([1.5, 2.5]),
                    "y": pa.array([10.0, 20.0])})
    got = _collect(unpivot(ray.data.from_arrow(tbl), ["id"], ["x", "y"])) \
        .sort_by([("id", "ascending"), ("metric", "ascending")])
    assert got.column("metric").to_pylist() == ["x", "y", "x", "y"]
    assert got.column("value").to_pylist() == [1.5, 10.0, 2.5, 20.0]


def test_dim_stats_vs_numpy(ray_session):
    g = np.random.default_rng(5)
    mat = g.normal(0, 2, (300, 8)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(
        [list(map(float, r)) for r in mat],
        pa.list_(pa.float32()))})
    got = dim_stats(_split_ds(tbl, 5), vec_col="embedding")
    m64 = mat.astype(np.float64)
    assert got.column("ord").to_pylist() == list(range(1, 9))
    assert got.column("n").to_pylist() == [300] * 8
    assert np.allclose(got.column("mean_v").to_numpy(),
                       np.round(m64.mean(axis=0), 6), atol=1e-6)
    assert np.allclose(got.column("std_v").to_numpy(),
                       np.round(m64.std(axis=0), 6), atol=1e-6)


def test_cohort_vs_duckdb(ray_session):
    tbl = _events(seed=23, n=2000, n_keys=37)
    con = duckdb.connect()
    con.register("ev", tbl)
    got_new = new_users_per_day(_split_ds(tbl), user_col="user_id",
                                ts_col="ts")
    want_new = con.sql("""
        SELECT day, count(*)::BIGINT AS n_new_users FROM (
          SELECT user_id, min(date_trunc('day', ts)) AS day
          FROM ev GROUP BY user_id) GROUP BY day ORDER BY day""").arrow()
    assert got_new.equals(want_new.cast(got_new.schema))

    got_ret = retention_matrix(_split_ds(tbl), user_col="user_id",
                               ts_col="ts")
    want_ret = con.sql("""
        WITH fs AS (SELECT user_id, min(date_trunc('day', ts))
                      AS cohort_day FROM ev GROUP BY user_id),
             act AS (SELECT DISTINCT user_id, date_trunc('day', ts)
                       AS active_day FROM ev)
        SELECT cohort_day, active_day, count(*)::BIGINT AS n_users
        FROM fs JOIN act USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""").arrow()
    assert got_ret.equals(want_ret.cast(got_ret.schema))
    # sanity: the diagonal (cohort day itself) covers every user once
    diag = sum(n for c, d, n in zip(
        got_ret.column("cohort_day").to_pylist(),
        got_ret.column("active_day").to_pylist(),
        got_ret.column("n_users").to_pylist()) if c == d)
    assert diag == len(set(tbl.column("user_id").to_pylist()))


def test_grouped_linreg_vs_numpy(ray_session):
    g = np.random.default_rng(9)
    n = 1500
    key = g.choice(["p", "q", "r"], n)
    x = g.uniform(0, 100, n)
    slope_of = {"p": 2.0, "q": -0.5, "r": 0.0}
    icpt_of = {"p": 3.0, "q": 10.0, "r": -1.0}
    y = np.array([slope_of[k] for k in key]) * x + \
        np.array([icpt_of[k] for k in key]) + g.normal(0, 1, n)
    tbl = pa.table({"grp": pa.array(key.tolist(), pa.string()),
                    "x": pa.array(x), "y": pa.array(y)})
    got = grouped_linreg(_split_ds(tbl, 6), key="grp", x_col="x",
                         y_col="y")
    assert got.column("grp").to_pylist() == ["p", "q", "r"]
    for i, k in enumerate(("p", "q", "r")):
        m = key == k
        want_slope, want_icpt = np.polyfit(x[m], y[m], 1)
        assert abs(got.column("slope")[i].as_py() - want_slope) < 1e-4
        assert abs(got.column("intercept")[i].as_py() - want_icpt) < 1e-4
        assert 0.0 <= got.column("r2")[i].as_py() <= 1.0


def test_broadcast_join_vs_duckdb(ray_session):
    from web_search_engine_ray.functions.grouping import broadcast_join
    g = np.random.default_rng(17)
    fact = pa.table({"k": pa.array(g.integers(0, 12, 200), pa.int64()),
                     "v": pa.array(np.arange(200, dtype=np.int64))})
    dim = pa.table({"k": pa.array(np.arange(0, 10), pa.int64()),
                    "name": pa.array([f"n{i}" for i in range(10)]),
                    "v": pa.array(np.arange(10, dtype=np.int64))})
    con = duckdb.connect()
    con.register("f", fact)
    con.register("d", dim)
    for how, jt in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        got = _collect(broadcast_join(_split_ds(fact, 5), dim, on="k",
                                      how=how)) \
            .sort_by([("k", "ascending"), ("v", "ascending")])
        want = con.sql(f"""
            SELECT f.k, f.v, d.name, d.v AS v_r FROM f {jt} d USING (k)
            ORDER BY f.k, f.v""").arrow()
        assert got.column("k").to_pylist() == want.column("k").to_pylist()
        assert got.column("name").to_pylist() == \
            want.column("name").to_pylist(), how
        assert got.column("v_r").to_pylist() == \
            want.column("v_r").to_pylist(), how


def test_profile_numeric_vs_numpy(ray_session):
    from web_search_engine_ray.pipelines.profile import profile_numeric
    g = np.random.default_rng(21)
    x = g.normal(5, 3, 500)
    y = g.integers(0, 100, 500).astype(np.float64)
    y[::7] = np.nan                      # planted nulls
    tbl = pa.table({"x": pa.array(x), "y": pa.array(y)})
    got = profile_numeric(_split_ds(tbl, 6), ["x", "y"])
    assert got.column("column").to_pylist() == ["x", "y"]
    assert got.column("n").to_pylist() == [500, int(np.isfinite(y).sum())]
    assert got.column("n_null").to_pylist() == [0, int(np.isnan(y).sum())]
    ok = y[np.isfinite(y)]
    assert np.allclose(got.column("mean").to_numpy(),
                       [round(x.mean(), 6), round(ok.mean(), 6)],
                       atol=2e-6)
    assert np.allclose(got.column("std").to_numpy(),
                       [round(x.std(), 6), round(ok.std(), 6)], atol=2e-6)
    assert got.column("min_v").to_numpy().tolist() == \
        [round(x.min(), 6), round(ok.min(), 6)]
    assert got.column("max_v").to_numpy().tolist() == \
        [round(x.max(), 6), round(ok.max(), 6)]


def test_quantiles_cont_vs_duckdb(ray_session):
    from web_search_engine_ray.pipelines.quantiles import \
        exact_quantiles_cont
    g = np.random.default_rng(31)
    vals = np.round(g.normal(100, 40, 3000), 4)
    tbl = pa.table({"v": pa.array(vals)})
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles_cont(_split_ds(tbl, 8), "v", qs, n_bins=64)
    con = duckdb.connect()
    con.register("t", tbl)
    want = [con.sql(f"SELECT round(quantile_cont(v, {q}), 6) FROM t")
            .fetchone()[0] for q in qs]
    assert got.column("q").to_pylist() == qs
    assert got.column("value").to_pylist() == want


def test_quantiles_cont_single_value(ray_session):
    from web_search_engine_ray.pipelines.quantiles import \
        exact_quantiles_cont
    tbl = pa.table({"v": pa.array([7.25] * 10)})
    got = exact_quantiles_cont(ray.data.from_arrow(tbl), "v", [0.5])
    assert got.column("value").to_pylist() == [7.25]


def test_vector_cov_vs_numpy(ray_session):
    from web_search_engine_ray.pipelines.stats import vector_cov
    g = np.random.default_rng(41)
    mat = g.normal(0, 1, (400, 5)).astype(np.float32)
    mat[:, 1] = mat[:, 0] * 0.5 + mat[:, 1] * 0.1    # planted correlation
    tbl = pa.table({"embedding": pa.array(
        [list(map(float, r)) for r in mat], pa.list_(pa.float32()))})
    got = vector_cov(_split_ds(tbl, 6), "embedding", dims=5)
    want = np.cov(mat.astype(np.float64).T, bias=True)
    iu, ju = np.triu_indices(5)
    assert got.column("di").to_pylist() == (iu + 1).tolist()
    assert got.column("dj").to_pylist() == (ju + 1).tolist()
    assert np.allclose(got.column("cov").to_numpy(), want[iu, ju],
                       atol=2e-6)


def test_grouped_weighted_mean(ray_session):
    from web_search_engine_ray.pipelines.stats import grouped_weighted_mean
    g = np.random.default_rng(43)
    key = g.choice(["a", "b"], 600)
    v = g.uniform(0, 10, 600)
    w = g.uniform(0.5, 2.0, 600)
    tbl = pa.table({"grp": pa.array(key.tolist()), "v": pa.array(v),
                    "w": pa.array(w)})
    got = grouped_weighted_mean(_split_ds(tbl, 5), "grp", "v", "w")
    for i, k in enumerate(("a", "b")):
        m = key == k
        assert abs(got.column("wmean")[i].as_py()
                   - (v[m] * w[m]).sum() / w[m].sum()) < 1e-6
        assert got.column("n_pts")[i].as_py() == int(m.sum())


def test_grouped_quantiles_cont_vs_duckdb(ray_session):
    from web_search_engine_ray.pipelines.quantiles import \
        grouped_quantiles_cont
    tbl = _events(seed=47, n=900, n_keys=7)
    got = grouped_quantiles_cont(_split_ds(tbl, 6), key="user_id",
                                 col="value", qs=[0.0, 0.25, 0.5, 1.0])
    con = duckdb.connect()
    con.register("ev", tbl)
    want = con.sql("""
        SELECT user_id, q, value FROM (
          SELECT user_id, 0.00::DOUBLE AS q,
                 round(quantile_cont(value, 0.00), 6) AS value
          FROM ev GROUP BY user_id
          UNION ALL SELECT user_id, 0.25,
                 round(quantile_cont(value, 0.25), 6)
          FROM ev GROUP BY user_id
          UNION ALL SELECT user_id, 0.50,
                 round(quantile_cont(value, 0.50), 6)
          FROM ev GROUP BY user_id
          UNION ALL SELECT user_id, 1.00,
                 round(quantile_cont(value, 1.00), 6)
          FROM ev GROUP BY user_id)
        ORDER BY user_id, q""").arrow()
    assert got.column("value").to_pylist() == \
        want.column("value").to_pylist()
    assert got.column("user_id").to_pylist() == \
        want.column("user_id").to_pylist()


def test_rolling_mean_range_vs_duckdb(ray_session):
    from web_search_engine_ray.pipelines.analytic import rolling_mean_range
    tbl = _events(seed=53, n=1000, n_keys=9)   # has duplicate-ts peers
    got = _collect(rolling_mean_range(
        _split_ds(tbl), key="user_id", ts_col="ts", val_col="value",
        id_col="event_id", interval_us=6 * 3_600_000_000)) \
        .sort_by("event_id")
    con = duckdb.connect()
    con.register("ev", tbl)
    want = con.sql("""
        SELECT event_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 6 HOUR PRECEDING
                     AND CURRENT ROW), 6) AS range_mean
        FROM ev ORDER BY event_id""").arrow()
    assert got.column("range_mean").to_pylist() == \
        want.column("range_mean").to_pylist()
