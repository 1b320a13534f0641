"""count_distinct / approx_distinct (pipelines/distinct.py) and
grouped_quantiles (pipelines/quantiles.py) vs exact ground truth."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.pipelines.distinct import (approx_distinct,
                                                      count_distinct)
from web_search_engine_ray.pipelines.quantiles import grouped_quantiles


def _events(seed=31, n=20000, n_users=5000):
    g = np.random.default_rng(seed)
    return pa.table({
        "etype": pa.array(g.choice(["a", "b", "c", "d"], n)),
        "user": pa.array(g.integers(0, n_users, n), pa.int64()),
        "value": pa.array(g.exponential(5.0, n)),
    })


def test_count_distinct_exact(ray_session):
    t = _events()
    got = count_distinct(ray.data.from_arrow(t).repartition(8),
                         "etype", "user")
    import pandas as pd
    want = t.to_pandas().groupby("etype")["user"].nunique().sort_index()
    assert got.column("etype").to_pylist() == list(want.index)
    assert got.column("n_distinct").to_pylist() == list(want.values)


def test_count_distinct_batching_invariant(ray_session):
    t = _events(seed=32, n=5000)
    a = count_distinct(ray.data.from_arrow(t), "etype", "user",
                       num_partitions=1)
    b = count_distinct(ray.data.from_arrow(t).repartition(11),
                       "etype", "user", num_partitions=7)
    assert a.to_pydict() == b.to_pydict()


def test_hll_error_bound(ray_session):
    # p=14 -> sd ~ 1.04/sqrt(16384) ~ 0.8%; assert within 3 sd
    for seed, n_users in [(41, 3000), (42, 50000), (43, 200)]:
        g = np.random.default_rng(seed)
        vals = g.integers(0, n_users, 40000)
        t = pa.table({"user": pa.array(vals, pa.int64())})
        exact = len(np.unique(vals))
        est = approx_distinct(ray.data.from_arrow(t).repartition(6),
                              "user", p=14)
        assert abs(est - exact) / exact < 0.025, (seed, est, exact)


def test_hll_deterministic_and_merge_order_free(ray_session):
    t = _events(seed=44)
    a = approx_distinct(ray.data.from_arrow(t), "user")
    b = approx_distinct(ray.data.from_arrow(t).repartition(13), "user")
    assert a == b   # registers merge by max — layout-independent


def test_grouped_quantiles_exact(ray_session):
    t = _events(seed=51, n=8000)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = grouped_quantiles(ray.data.from_arrow(t).repartition(7),
                            "etype", "value", qs)
    df = t.to_pandas()
    for et in sorted(df["etype"].unique()):
        s = np.sort(df.loc[df["etype"] == et, "value"].values)
        sub = got.filter(pa.compute.equal(got.column("etype"), et))
        for q, v in zip(sub.column("q").to_pylist(),
                        sub.column("value").to_pylist()):
            want = s[max(0, math.ceil(q * len(s)) - 1)]
            assert v == round(want, 6), (et, q)


def test_grouped_quantiles_single_row_groups(ray_session):
    t = pa.table({"k": pa.array(["x", "y"]),
                  "value": pa.array([3.25, 7.5])})
    got = grouped_quantiles(ray.data.from_arrow(t), "k", "value",
                            [0.1, 0.9])
    assert got.column("value").to_pylist() == [3.25, 3.25, 7.5, 7.5]


def test_distinct_rows_exact(ray_session):
    from web_search_engine_ray.pipelines.distinct import distinct_rows
    t = _events(seed=91, n=6000, n_users=300)
    out = distinct_rows(ray.data.from_arrow(t).repartition(9),
                        ["etype", "user"])
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))) \
        .sort_by([("etype", "ascending"), ("user", "ascending")])
    df = t.to_pandas()[["etype", "user"]].drop_duplicates() \
        .sort_values(["etype", "user"])
    assert got.column("etype").to_pylist() == df["etype"].tolist()
    assert got.column("user").to_pylist() == df["user"].tolist()
