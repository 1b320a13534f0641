"""exact_quantiles (pipelines/quantiles.py) vs numpy ground truth under
skew, duplicates, tiny bins, and degenerate inputs.  The DuckDB rule:
sorted[max(0, ceil(q*n) - 1)]."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.pipelines.quantiles import exact_quantiles

QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _truth(vals, q):
    s = np.sort(vals)
    return float(s[max(0, math.ceil(q * len(s)) - 1)])


def _check(vals, qs=QS, n_bins=64, blocks=5):
    ds = ray.data.from_arrow(pa.table({
        "value": pa.array(vals, pa.float64())})).repartition(blocks)
    out = exact_quantiles(ds, "value", qs, n_bins=n_bins)
    got = dict(zip(out.column("q").to_pylist(),
                   out.column("value").to_pylist()))
    for q in qs:
        assert got[q] == round(_truth(vals, q), 6), (q, got[q])


def test_uniform(ray_session):
    rng = np.random.default_rng(3)
    _check(rng.uniform(-5, 17, 5000).round(4).tolist())


def test_skewed_heavy_duplicates(ray_session):
    rng = np.random.default_rng(4)
    # 90% of mass on one value (one bin holds most ranks)
    vals = np.concatenate([np.full(9000, 2.5),
                           rng.exponential(10, 1000)])
    _check(vals.round(4).tolist(), n_bins=16)


def test_tiny_input_and_extreme_qs(ray_session):
    _check([42.0], qs=[0.0, 0.5, 1.0], blocks=1)
    _check([1.0, 2.0, 3.0, 4.0], qs=[0.25, 0.5, 0.51, 0.75], blocks=2)


def test_all_equal(ray_session):
    out = exact_quantiles(
        ray.data.from_arrow(pa.table({"value": pa.array([7.0] * 100)})),
        "value", [0.1, 0.9])
    assert out.column("value").to_pylist() == [7.0, 7.0]


def test_empty(ray_session):
    out = exact_quantiles(
        ray.data.from_arrow(pa.table({"value": pa.array([], pa.float64())})),
        "value", [0.5])
    assert out.num_rows == 0
