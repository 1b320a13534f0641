"""relational.py (TPC-H-style joins/aggregates) vs a DuckDB in-test
oracle on a seeded synthetic star schema — covers boundary dates that
filter everything, revenue ties at the top-k cut, and customers with
no orders.  The driver-contract constants are covered separately by
test_oracle_contract; this exercises the shapes on adversarial data."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from web_search_engine_ray.pipelines.relational import (
    nation_revenue, pricing_summary, shipping_priority_topk)


def _synth(seed=7, n_line=4000, n_orders=800, n_cust=120):
    g = np.random.default_rng(seed)
    days = np.datetime64("1996-01-01", "us") + \
        g.integers(0, 1000, n_line) * np.timedelta64(86400_000_000, "us")
    lineitem = pa.table({
        "l_orderkey": pa.array(g.integers(0, n_orders, n_line), pa.int64()),
        "l_quantity": pa.array(g.integers(1, 50, n_line).astype(float)),
        # continuous values: grid-locked prices (e.g. k*25 with 5%
        # discounts) park true sums EXACTLY on .005 rounding
        # boundaries, where float summation order decides the cent —
        # a measure-zero hazard for real data that a synthetic grid
        # hits with probability ~1 (see relational.py rounding note)
        "l_extendedprice": pa.array(g.uniform(100.0, 1000.0, n_line)),
        "l_discount": pa.array(g.uniform(0.0, 0.1, n_line)),
        "l_tax": pa.array(g.uniform(0.0, 0.08, n_line)),
        "l_returnflag": pa.array(g.choice(["A", "N", "R"], n_line)),
        "l_linestatus": pa.array(g.choice(["F", "O"], n_line)),
        "l_shipdate": pa.array(days, pa.timestamp("us")),
    })
    odays = np.datetime64("1996-01-01", "us") + \
        g.integers(0, 900, n_orders) * np.timedelta64(86400_000_000, "us")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(g.integers(0, n_cust + 30, n_orders),
                              pa.int64()),   # some custkeys don't exist
        "o_orderdate": pa.array(odays, pa.timestamp("us")),
        "o_orderpriority": pa.array(g.choice(["1-URGENT", "2-HIGH"],
                                             n_orders)),
    })
    customer = pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_mktsegment": pa.array(g.choice(["BUILDING", "AUTO"], n_cust)),
        "c_nationkey": pa.array(g.integers(0, 6, n_cust), pa.int32()),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(6), pa.int32()),
        "n_name": pa.array([f"NAT{i}" for i in range(6)]),
        "n_regionkey": pa.array(np.arange(6) % 2, pa.int32()),
    })
    region = pa.table({
        "r_regionkey": pa.array(np.arange(2), pa.int32()),
        "r_name": pa.array(["EAST", "WEST"]),
    })
    return lineitem, orders, customer, nation, region


def _con(lineitem, orders, customer, nation, region):
    con = duckdb.connect()
    for name, t in [("lineitem", lineitem), ("orders", orders),
                    ("customer", customer), ("nation", nation),
                    ("region", region)]:
        con.register(name, t)
    return con


def test_pricing_summary(ray_session):
    li, o, c, n, r = _synth()
    got = pricing_summary(ray.data.from_arrow(li).repartition(7),
                          "1997-06-15")
    con = _con(li, o, c, n, r)
    want = con.sql("""
        SELECT l_returnflag, l_linestatus,
          round(sum(l_quantity),6) sum_qty,
          round(sum(l_extendedprice),2) sum_base_price,
          round(sum(l_extendedprice*(1-l_discount)),2) sum_disc_price,
          round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) sum_charge,
          round(avg(l_quantity),6) avg_qty,
          round(avg(l_extendedprice),6) avg_price,
          round(avg(l_discount),6) avg_disc, count(*) count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-06-15'
        GROUP BY 1,2 ORDER BY 1,2""").arrow()
    assert got.to_pydict() == want.to_pydict()


def test_pricing_summary_all_filtered(ray_session):
    li, o, c, n, r = _synth()
    got = pricing_summary(ray.data.from_arrow(li), "1900-01-01")
    assert got.num_rows == 0


def test_shipping_topk_with_ties(ray_session):
    li, o, c, n, r = _synth()
    got = shipping_priority_topk(
        ray.data.from_arrow(c).repartition(3),
        ray.data.from_arrow(o).repartition(4),
        ray.data.from_arrow(li).repartition(7),
        segment="BUILDING", date="1997-01-01", k=15)
    con = _con(li, o, c, n, r)
    want = con.sql("""
        SELECT l_orderkey o_orderkey,
          round(sum(l_extendedprice*(1-l_discount)),2) revenue,
          o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey=o_custkey
        JOIN lineitem ON l_orderkey=o_orderkey
        WHERE c_mktsegment='BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY 1,3,4 ORDER BY revenue DESC, o_orderkey LIMIT 15""").arrow()
    assert got.to_pydict() == want.to_pydict()


def test_nation_revenue(ray_session):
    li, o, c, n, r = _synth()
    got = nation_revenue(
        r, n,
        ray.data.from_arrow(c).repartition(3),
        ray.data.from_arrow(o).repartition(4),
        ray.data.from_arrow(li).repartition(7),
        region_name="EAST", date_lo="1996-06-01", date_hi="1998-01-01")
    con = _con(li, o, c, n, r)
    want = con.sql("""
        SELECT n_name,
          round(sum(l_extendedprice*(1-l_discount)),2) revenue
        FROM region JOIN nation ON n_regionkey=r_regionkey
        JOIN customer ON c_nationkey=n_nationkey
        JOIN orders ON o_custkey=c_custkey
        JOIN lineitem ON l_orderkey=o_orderkey
        WHERE r_name='EAST'
          AND o_orderdate >= TIMESTAMP '1996-06-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY revenue DESC, n_name""").arrow()
    assert got.to_pydict() == want.to_pydict()


def test_rollup_counts_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    g = np.random.default_rng(7)
    tbl = pa.table({
        "lang": pa.array([f"l{i}" for i in g.integers(0, 4, 500)]),
        "source": pa.array([f"s{i}" for i in g.integers(0, 6, 500)]),
    })
    from web_search_engine_ray.pipelines.relational import rollup_counts
    got = rollup_counts(ray.data.from_arrow(tbl).repartition(4),
                        ["lang", "source"])
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.sql("""
        SELECT lang, source, count(*)::BIGINT AS n_docs
        FROM t GROUP BY ROLLUP(lang, source)
        ORDER BY lang NULLS LAST, source NULLS LAST""").arrow()
    got = got.sort_by([("lang", "ascending"), ("source", "ascending")])
    assert got.column("n_docs").to_pylist() == \
        want.column("n_docs").to_pylist()
    assert got.column("lang").to_pylist() == want.column("lang").to_pylist()
    assert got.column("source").to_pylist() == \
        want.column("source").to_pylist()
    # grand-total row present exactly once
    import pyarrow.compute as pc
    both_null = pc.and_(pc.is_null(got.column("lang")),
                        pc.is_null(got.column("source")))
    assert pc.sum(pc.cast(both_null, pa.int64())).as_py() == 1


def test_rollup_counts_empty_input(ray_session):
    """An empty corpus must yield exactly the SQL ROLLUP grand-total row
    (n=0, all keys NULL) — not an ArrowInvalid from concat_tables([])."""
    from web_search_engine_ray.pipelines.relational import rollup_counts
    tbl = pa.table({"lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string())})
    out = rollup_counts(ray.data.from_arrow(tbl), ["lang", "source"])
    assert out.num_rows == 1
    assert out.column("lang").to_pylist() == [None]
    assert out.column("source").to_pylist() == [None]
    assert out.column("n_docs").to_pylist() == [0]
