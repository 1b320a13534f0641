"""range_join / pivot_counts (relational.py) and stratified_sample
(sampling.py) vs DuckDB oracles on seeded synthetic data."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.pipelines.relational import (pivot_counts,
                                                        range_join)
from web_search_engine_ray.pipelines.sampling import stratified_sample


def test_range_join_overlapping_bands(ray_session):
    g = np.random.default_rng(61)
    t = pa.table({"id": pa.array(np.arange(2000), pa.int64()),
                  "v": pa.array(g.uniform(0, 120, 2000))})
    bands = pa.table({"lo": pa.array([0.0, 20.0, 90.0], pa.float64()),
                      "hi": pa.array([30.0, 100.0, 95.0], pa.float64()),
                      "label": pa.array(["a", "b", "c"])})
    out = range_join(ray.data.from_arrow(t).repartition(5), "v",
                     bands, "lo", "hi", ["label"])
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))) \
        .sort_by([("id", "ascending"), ("label", "ascending")])
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT t.id, t.v, b.label
        FROM t JOIN (VALUES (0.0,30.0,'a'),(20.0,100.0,'b'),
                            (90.0,95.0,'c')) b(lo,hi,label)
          ON t.v >= b.lo AND t.v < b.hi
        ORDER BY t.id, b.label""").arrow()
    assert got.column("id").to_pylist() == want.column("id").to_pylist()
    assert got.column("label").to_pylist() == \
        want.column("label").to_pylist()


def test_pivot_counts(ray_session):
    g = np.random.default_rng(62)
    t = pa.table({"lang": pa.array(g.choice(["de", "en", "fr"], 3000)),
                  "src": pa.array(g.choice(["s0", "s1", "s2", "s3"],
                                           3000))})
    got = pivot_counts(ray.data.from_arrow(t).repartition(6),
                       "lang", "src", ["s0", "s1", "s2", "s3", "s9"])
    df = t.to_pandas()
    for i, lang in enumerate(got.column("lang").to_pylist()):
        for s in ["s0", "s1", "s2", "s3"]:
            want = int(((df["lang"] == lang) & (df["src"] == s)).sum())
            assert got.column(s)[i].as_py() == want
        assert got.column("s9")[i].as_py() == 0   # absent category -> 0


def test_stratified_sample_matches_sql(ray_session):
    g = np.random.default_rng(63)
    t = pa.table({"doc_id": pa.array(np.arange(1000), pa.int64()),
                  "lang": pa.array(g.choice(["de", "en", "fr", "zh"],
                                            1000)),
                  "x": pa.array(g.uniform(0, 1, 1000))})
    got = stratified_sample(ray.data.from_arrow(t).repartition(7),
                            key="lang", id_col="doc_id", n_per_group=7)
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql("""
        SELECT doc_id, lang, x FROM t
        QUALIFY row_number() OVER (
          PARTITION BY lang
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 7
        ORDER BY lang, doc_id""").arrow()
    assert got.column("doc_id").to_pylist() == \
        want.column("doc_id").to_pylist()
    assert got.column("lang").to_pylist() == want.column("lang").to_pylist()


def test_stratified_sample_partition_invariant(ray_session):
    g = np.random.default_rng(64)
    t = pa.table({"doc_id": pa.array(np.arange(500), pa.int64()),
                  "lang": pa.array(g.choice(["a", "b"], 500))})
    one = stratified_sample(ray.data.from_arrow(t), "lang", "doc_id", 3,
                            num_partitions=1)
    many = stratified_sample(ray.data.from_arrow(t).repartition(9),
                             "lang", "doc_id", 3, num_partitions=5)
    assert one.to_pydict() == many.to_pydict()


def test_stratified_small_groups_keep_all(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "lang": pa.array(["a", "a", "b"])})
    got = stratified_sample(ray.data.from_arrow(t), "lang", "doc_id", 10)
    assert got.num_rows == 3
