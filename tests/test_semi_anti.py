"""semi_join / anti_join (functions/grouping.py) vs pandas ground
truth: complement partition, duplicate right keys, empty sides."""

import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.functions.grouping import anti_join, semi_join


def _sides(seed=81, n_l=3000, n_r=900):
    g = np.random.default_rng(seed)
    left = pa.table({"k": pa.array(g.integers(0, 500, n_l), pa.int64()),
                     "v": pa.array(g.uniform(0, 1, n_l))})
    # right keys cover only part of the range, with heavy duplication
    right = pa.table({"k": pa.array(g.integers(200, 450, n_r), pa.int64()),
                      "w": pa.array(g.uniform(0, 1, n_r))})
    return left, right


def _ids(ds) -> list:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return []
    t = pa.concat_tables(batches, promote_options="default")
    return sorted(zip(t.column("k").to_pylist(), t.column("v").to_pylist()))


def test_semi_anti_partition_and_complement(ray_session):
    left, right = _sides()
    l = ray.data.from_arrow(left).repartition(6)
    r = ray.data.from_arrow(right).repartition(4)
    semi = _ids(semi_join(l, r, on="k"))
    anti = _ids(anti_join(l, r, on="k"))
    rset = set(right.column("k").to_pylist())
    rows = list(zip(left.column("k").to_pylist(),
                    left.column("v").to_pylist()))
    assert semi == sorted(x for x in rows if x[0] in rset)
    assert anti == sorted(x for x in rows if x[0] not in rset)
    assert len(semi) + len(anti) == left.num_rows   # exact partition


def test_semi_empty_right(ray_session):
    left, _ = _sides(seed=82, n_l=50)
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "w": pa.array([], pa.float64())})
    l = ray.data.from_arrow(left)
    assert _ids(semi_join(l, ray.data.from_arrow(empty), on="k")) == []
    assert len(_ids(anti_join(l, ray.data.from_arrow(empty), on="k"))) \
        == left.num_rows
