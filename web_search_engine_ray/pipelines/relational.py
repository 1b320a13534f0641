"""Relational analytics over the TPC-H-shaped tables — the engine's
general joins/aggregates leg (spec: BASELINE.json north_rule's "same
query and data-processing capabilities"; tables per TESTDATA.md).

Shapes (all 100 TB-safe):

- ``pricing_summary`` (TPC-H Q1 analog) — filter + derived columns +
  grouped multi-aggregate.  Per-batch Arrow combiner collapses each
  batch to <= n_groups rows (returnflag x linestatus is a tiny,
  data-bounded key space), ONE hash exchange of those partial rows,
  vectorized finalize (sums -> avgs).  The corpus is never shuffled.
- ``shipping_priority_topk`` (Q3 analog) — segment semi-join
  (customer keys), two large-table hash joins (orders, lineitem; one
  exchange each via functions.grouping.hash_join), per-batch revenue
  combiner keyed on the order, one exchange of partials, then global
  top-k WITHOUT a global sort (per-block candidates, driver merges
  k x n_blocks skinny rows).
- ``nation_revenue`` (Q5-style) — dimension tables (region, nation:
  O(100) rows at any scale) are joined driver-side and broadcast once
  via ``ray.put``; facts flow through hash joins and a nation-keyed
  combiner whose output is bounded by the nation count.

Rounding contract: money sums are rounded to 2 decimals (the oracle
rounds identically).  Distributed summation order can move a sum by
~n*eps*max_value (~1e-6 at 1e8 scale), so equality with the oracle
holds unless the TRUE sum sits within that error of a .005 boundary —
measure-zero for continuous-valued data, but constructible (grid
prices x grid discounts); see tests/test_relational.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from web_search_engine_ray.functions.grouping import hash_join, hash_partition

_PRICING_PARTIAL = {
    "l_returnflag": pa.string(), "l_linestatus": pa.string(),
    "sum_qty": pa.float64(), "sum_base_price": pa.float64(),
    "sum_disc_price": pa.float64(), "sum_charge": pa.float64(),
    "sum_disc": pa.float64(), "count_order": pa.int64(),
}


def _empty(schema: dict) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in schema.items()})


def pricing_summary(lineitem: "ray.data.Dataset",
                    cutoff: str) -> pa.Table:
    """Q1: per (l_returnflag, l_linestatus) over l_shipdate <= cutoff:
    sum_qty, sum_base_price, sum_disc_price, sum_charge, avg_qty,
    avg_price, avg_disc, count_order (floats rounded to 6)."""
    cut = np.datetime64(cutoff, "us")

    def _partial(batch: pa.Table) -> pa.Table:
        m = pc.less_equal(batch.column("l_shipdate"),
                          pa.scalar(cut, pa.timestamp("us")))
        t = batch.filter(m)
        if t.num_rows == 0:
            return _empty(_PRICING_PARTIAL)
        ep = t.column("l_extendedprice")
        disc = t.column("l_discount")
        one_m_d = pc.subtract(pa.scalar(1.0), disc)
        disc_price = pc.multiply(ep, one_m_d)
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), t.column("l_tax")))
        g = pa.TableGroupBy(pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": t.column("l_quantity"), "bp": ep,
            "dp": disc_price, "ch": charge, "d": disc,
        }), ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("bp", "sum"), ("dp", "sum"),
             ("ch", "sum"), ("d", "sum"), ([], "count_all")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": g.column("qty_sum"),
            "sum_base_price": g.column("bp_sum"),
            "sum_disc_price": g.column("dp_sum"),
            "sum_charge": g.column("ch_sum"),
            "sum_disc": g.column("d_sum"),
            "count_order": g.column("count_all")})

    partials = lineitem.select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax", "l_shipdate"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)

    def _final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty({k: v for k, v in _PRICING_PARTIAL.items()
                           if k != "sum_disc"} | {"avg_qty": pa.float64(),
                                                  "avg_price": pa.float64(),
                                                  "avg_disc": pa.float64()})
        g = pa.TableGroupBy(batch, ["l_returnflag", "l_linestatus"]) \
            .aggregate([("sum_qty", "sum"), ("sum_base_price", "sum"),
                        ("sum_disc_price", "sum"), ("sum_charge", "sum"),
                        ("sum_disc", "sum"), ("count_order", "sum")])
        n = g.column("count_order_sum").to_numpy().astype(np.float64)
        # money sums reach ~1e8 with float addition error near 1e-6, so
        # a 6-decimal round is hash-unstable across summation orders;
        # 2 decimals (money semantics) leaves 4 orders of margin.
        # sum_qty is a sum of small integral doubles — exact — and the
        # avgs divide by n, shrinking the error well under 1e-6.
        r2 = (lambda c: pa.array(
            np.round(g.column(c).to_numpy(), 2), pa.float64()))
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": pa.array(np.round(
                g.column("sum_qty_sum").to_numpy(), 6), pa.float64()),
            "sum_base_price": r2("sum_base_price_sum"),
            "sum_disc_price": r2("sum_disc_price_sum"),
            "sum_charge": r2("sum_charge_sum"),
            "avg_qty": pa.array(np.round(
                g.column("sum_qty_sum").to_numpy() / n, 6), pa.float64()),
            "avg_price": pa.array(np.round(
                g.column("sum_base_price_sum").to_numpy() / n, 6),
                pa.float64()),
            "avg_disc": pa.array(np.round(
                g.column("sum_disc_sum").to_numpy() / n, 6), pa.float64()),
            "count_order": g.column("count_order_sum")})

    batches = list(
        hash_partition(partials, ["l_returnflag", "l_linestatus"])
        .map_batches(_final, batch_size=None, batch_format="pyarrow",
                     zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow"))
    if not batches:
        return _final(_empty(_PRICING_PARTIAL))
    out = pa.concat_tables(batches, promote_options="default")
    return out.sort_by([("l_returnflag", "ascending"),
                        ("l_linestatus", "ascending")])


def _blockwise_topk(ds: "ray.data.Dataset", order_col: str, tie_col: str,
                    k: int, empty: pa.Table) -> pa.Table:
    """Global top-k when each key's total lives in one block: per-block
    candidate cut (k rows) -> driver merge of k x n_blocks rows."""
    def _cand(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[
            (order_col, "descending"), (tie_col, "ascending")])
        return batch.take(idx.slice(0, k))
    batches = list(ds.map_batches(
        _cand, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_format="pyarrow"))
    merged = pa.concat_tables(batches, promote_options="default") \
        if batches else empty
    return merged.sort_by([(order_col, "descending"),
                           (tie_col, "ascending")]).slice(0, k)


_SHIP_SCHEMA = {"o_orderkey": pa.int64(), "revenue": pa.float64(),
                "o_orderdate": pa.timestamp("us"),
                "o_orderpriority": pa.string()}


def shipping_priority_topk(customer: "ray.data.Dataset",
                           orders: "ray.data.Dataset",
                           lineitem: "ray.data.Dataset",
                           segment: str, date: str,
                           k: int = 10) -> pa.Table:
    """Q3: top-k orders by revenue = sum(l_extendedprice*(1-l_discount))
    among customers in ``segment``, o_orderdate < date < l_shipdate.
    Ties: o_orderkey ascending.  Columns: o_orderkey, revenue,
    o_orderdate, o_orderpriority."""
    d = np.datetime64(date, "us")
    ts = pa.scalar(d, pa.timestamp("us"))

    cust = customer.select_columns(["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda b: b.filter(
            pc.equal(b.column("c_mktsegment"), segment))
            .select(["c_custkey"]).rename_columns(["o_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
    ordr = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(lambda b: b.filter(
            pc.less(b.column("o_orderdate"), ts)),
            batch_format="pyarrow", zero_copy_batch=True)
    # semi-join: orders of in-segment customers (hash join on custkey)
    ordr_in = hash_join(ordr, cust, on="o_custkey") \
        .select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])

    line = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(lambda b: (lambda t: pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "rev": pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")))}))(
                b.filter(pc.greater(b.column("l_shipdate"), ts))),
            batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(line, ordr_in, on="o_orderkey")

    def _rev_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(_SHIP_SCHEMA)
        g = pa.TableGroupBy(batch, ["o_orderkey", "o_orderdate",
                                    "o_orderpriority"]) \
            .aggregate([("rev", "sum")])
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "revenue": g.column("rev_sum"),
                         "o_orderdate": g.column("o_orderdate"),
                         "o_orderpriority": g.column("o_orderpriority")})

    # partial per join partition, then ONE exchange so each order's
    # total lands in a single block (hash_join output is already
    # partitioned by o_orderkey, but the combiner keeps the exchange
    # rows-per-distinct-order, not rows-per-lineitem)
    def _rev_final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty(_SHIP_SCHEMA)
        g = pa.TableGroupBy(batch, ["o_orderkey", "o_orderdate",
                                    "o_orderpriority"]) \
            .aggregate([("revenue", "sum")])
        return pa.table({
            "o_orderkey": g.column("o_orderkey"),
            # per-order sums span few lineitems -> addition error ~1e-11;
            # round 2 (money) matches the oracle with wide margin
            "revenue": pa.array(np.round(
                g.column("revenue_sum").to_numpy(), 2), pa.float64()),
            "o_orderdate": g.column("o_orderdate"),
            "o_orderpriority": g.column("o_orderpriority")})

    totals = hash_partition(
        joined.map_batches(_rev_partial, batch_size=None,
                           batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"]).map_batches(
        _rev_final, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)
    return _blockwise_topk(totals, "revenue", "o_orderkey", k,
                           _empty(_SHIP_SCHEMA)) \
        .select(["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"])


def range_join(left: "ray.data.Dataset", lcol: str, bands: pa.Table,
               lo_col: str, hi_col: str,
               band_cols: list[str]) -> "ray.data.Dataset":
    """Non-equi band join: each left row matches every band with
    ``lo <= left[lcol] < hi`` (bands may overlap — a row can emit
    multiple matches; rows in no band drop).

    The band table is the broadcast side (``ray.put`` once, read per
    task) — the standard shape for banded/range joins whose band count
    is small relative to the corpus.  Per batch the match is one
    vectorized mask per band (O(n_bands x batch_rows) compares, all in
    numpy).  A corpus-sized right side would instead need a
    range-partitioned exchange (split band space into tiles, replicate
    straddling bands) — out of scope until a caller needs it."""
    for c in (lo_col, hi_col, *band_cols):
        if c not in bands.schema.names:
            raise ValueError(f"{c!r} not in bands: {bands.schema.names}")
    bands_ref = ray.put(bands)

    def _match(batch: pa.Table) -> pa.Table:
        bt = ray.get(bands_ref)
        lo = bt.column(lo_col).to_numpy().astype(np.float64)
        hi = bt.column(hi_col).to_numpy().astype(np.float64)
        v = batch.column(lcol).to_numpy().astype(np.float64)
        l_idx, b_idx = [], []
        for i in range(len(lo)):
            hit = np.flatnonzero((v >= lo[i]) & (v < hi[i]))
            l_idx.append(hit)
            b_idx.append(np.full(len(hit), i, np.int64))
        li = np.concatenate(l_idx) if l_idx else np.empty(0, np.int64)
        bi = np.concatenate(b_idx) if b_idx else np.empty(0, np.int64)
        lt = batch.take(pa.array(li, pa.int64()))
        cols = {c: lt.column(c) for c in batch.schema.names}
        for c in band_cols:
            cols[c] = bt.column(c).take(pa.array(bi, pa.int64()))
        return pa.table(cols)

    return left.map_batches(_match, batch_format="pyarrow",
                            zero_copy_batch=True)


def pivot_counts(ds: "ray.data.Dataset", row_key: str, col_key: str,
                 categories: list[str]) -> pa.Table:
    """Crosstab: one row per ``row_key`` value, one int64 count column
    per category of ``col_key`` (pinned list — makes the output schema
    static and the SQL oracle expressible as FILTER aggregates).

    Per-batch combiner reduces a batch to its distinct (row, col)
    count cells; cells stream to the driver, whose state is bounded by
    |rows| x |categories| — the pivot contract (a pivot with unbounded
    row cardinality is just a groupby and should stay long-form)."""
    def _cells(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "r": batch.column(row_key), "c": batch.column(col_key)}),
            ["r", "c"]).aggregate([([], "count_all")])
        return pa.table({"r": g.column("r"), "c": g.column("c"),
                         "n": g.column("count_all")})

    acc: dict[tuple, int] = {}
    for b in ds.select_columns([row_key, col_key]).map_batches(
            _cells, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for r, c, n in zip(b.column("r").to_pylist(),
                           b.column("c").to_pylist(),
                           b.column("n").to_pylist()):
            acc[(r, c)] = acc.get((r, c), 0) + n
    rows = sorted({r for r, _ in acc})
    out = {row_key: pa.array(rows, pa.string())}
    for cat in categories:
        out[cat] = pa.array([acc.get((r, cat), 0) for r in rows],
                            pa.int64())
    return pa.table(out)


def pivot_sum(ds: "ray.data.Dataset", row_key: str, col_key: str,
              value_col: str, categories: list[str],
              decimals: int = 6) -> pa.Table:
    """SUM-valued crosstab: one row per ``row_key``, one float64 column
    per pinned category holding ``SUM(value) FILTER (col = cat)`` (0.0
    where the cell is empty — the COALESCE'd SQL form).  Same combiner
    contract as pivot_counts: each batch collapses to its distinct
    (row, col) partial sums; driver state is |rows| x |categories|."""
    row_t = ds.schema().types[ds.schema().names.index(row_key)]

    def _cells(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({
            "r": batch.column(row_key), "c": batch.column(col_key),
            "v": batch.column(value_col)}), ["r", "c"]) \
            .aggregate([("v", "sum")])
        return pa.table({"r": g.column("r"), "c": g.column("c"),
                         "s": g.column("v_sum")})

    acc: dict[tuple, float] = {}
    for b in ds.select_columns([row_key, col_key, value_col]).map_batches(
            _cells, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for r, c, s in zip(b.column("r").to_pylist(),
                           b.column("c").to_pylist(),
                           b.column("s").to_pylist()):
            acc[(r, c)] = acc.get((r, c), 0.0) + s
    rows = sorted({r for r, _ in acc})
    out = {row_key: pa.array(rows, row_t)}
    for cat in categories:
        out[cat] = pa.array(
            [round(acc.get((r, cat), 0.0), decimals) for r in rows],
            pa.float64())
    return pa.table(out)


def unpivot(ds: "ray.data.Dataset", id_cols: list[str],
            value_cols: list[str], name_col: str = "metric",
            value_col: str = "value") -> "ray.data.Dataset":
    """Melt (the inverse of pivot): wide rows (id..., v1, v2, ...)
    become |value_cols| long rows (id..., metric=<col name>,
    value=<float64 v>) — the SQL ``UNPIVOT`` / stacked ``UNION ALL``.
    Pure per-batch reshape (one projected sub-table per value column,
    concatenated): no shuffle, no driver state, output streams at
    |value_cols| x input rows."""
    def _melt(batch: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            parts.append(pa.table({
                **{c: batch.column(c) for c in id_cols},
                name_col: pa.array([vc] * batch.num_rows, pa.string()),
                value_col: batch.column(vc).cast(pa.float64())}))
        return pa.concat_tables(parts)

    return ds.select_columns(id_cols + value_cols).map_batches(
        _melt, batch_format="pyarrow", zero_copy_batch=True)


def _finest_counts(ds: "ray.data.Dataset", keys: list[str]) -> pa.Table:
    """ONE streaming pass of per-batch combiner counts at the finest
    (all-keys) level, summed driver-side — |distinct key tuples| rows
    (the shared input of rollup_counts and cube_counts)."""
    def _cells(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(keys), keys) \
            .aggregate([([], "count_all")])
        return g.rename_columns(keys + ["n"])

    types = dict(zip(ds.schema().names, ds.schema().types))
    seed = pa.table({**{k: pa.array([], types[k]) for k in keys},
                     "n": pa.array([], pa.int64())})
    # seeded so an EMPTY corpus yields zero finest cells (not an
    # ArrowInvalid) and the super-aggregate still emits the SQL
    # grand-total row
    finest = pa.concat_tables([seed] + list(
        ds.select_columns(keys).map_batches(
            _cells, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")))
    if finest.num_rows:
        finest = pa.TableGroupBy(finest, keys).aggregate([("n", "sum")]) \
            .rename_columns(keys + ["n"])
    return finest


def rollup_counts(ds: "ray.data.Dataset", keys: list[str]) -> pa.Table:
    """GROUP BY ROLLUP(keys): counts at every prefix level of the key
    hierarchy — (k1..kn), (k1..kn-1, NULL), ..., (all NULL) — exactly
    DuckDB's ROLLUP null-filling.

    Shape: see _finest_counts; the super-aggregate levels are derived
    from that bounded table (|distinct key tuples| rows — the same
    driver-state contract as pivot_counts: a rollup over
    unbounded-cardinality keys is just a groupby and should stay
    long-form)."""
    finest = _finest_counts(ds, keys)
    levels = [finest]
    cur = finest
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        if kept:
            g = pa.TableGroupBy(cur.select(kept + ["n"]), kept) \
                .aggregate([("n", "sum")]).rename_columns(kept + ["n"])
        else:
            import pyarrow.compute as pc
            total = pc.sum(cur.column("n")).as_py() or 0
            g = pa.table({"n": pa.array([total], pa.int64())})
        cols = {}
        for k in keys:
            cols[k] = g.column(k) if k in kept \
                else pa.nulls(g.num_rows, finest.schema.field(k).type)
        cols["n"] = g.column("n")
        levels.append(pa.table(cols))
        cur = levels[-1]
    out = pa.concat_tables(levels)
    out = pa.table({**{k: out.column(k) for k in keys},
                    "n_docs": out.column("n").cast(pa.int64())})
    return out.sort_by([(k, "ascending") for k in keys])


def cube_counts(ds: "ray.data.Dataset", keys: list[str]) -> pa.Table:
    """GROUP BY CUBE(keys): counts at every SUBSET of the key set (2^n
    levels), with DuckDB's null-filling for the dropped keys.  Same
    shape as rollup_counts — one streaming finest-level pass, all
    2^n super-aggregates derived from the bounded finest table."""
    from itertools import combinations

    finest = _finest_counts(ds, keys)
    levels = []
    for r in range(len(keys), -1, -1):
        for kept in combinations(keys, r):
            kept = list(kept)
            if len(kept) == len(keys):
                g = finest
            elif kept:
                g = pa.TableGroupBy(finest.select(kept + ["n"]), kept) \
                    .aggregate([("n", "sum")]).rename_columns(kept + ["n"])
            else:
                total = pc.sum(finest.column("n")).as_py() or 0
                g = pa.table({"n": pa.array([total], pa.int64())})
            cols = {}
            for k in keys:
                cols[k] = g.column(k) if k in kept \
                    else pa.nulls(g.num_rows, finest.schema.field(k).type)
            cols["n"] = g.column("n")
            levels.append(pa.table(cols))
    out = pa.concat_tables(levels)
    out = pa.table({**{k: out.column(k) for k in keys},
                    "n_docs": out.column("n").cast(pa.int64())})
    return out.sort_by([(k, "ascending") for k in keys])


def nation_revenue(region: pa.Table, nation: pa.Table,
                   customer: "ray.data.Dataset",
                   orders: "ray.data.Dataset",
                   lineitem: "ray.data.Dataset",
                   region_name: str, date_lo: str,
                   date_hi: str) -> pa.Table:
    """Q5-style: revenue by customer nation within ``region_name`` for
    orders with date_lo <= o_orderdate < date_hi.  Dimension tables
    (region, nation — O(100) rows at any corpus scale) come in as
    driver-side Arrow tables and are broadcast ONCE via ray.put; the
    fact tables stream through hash joins.  Output (n_name, revenue)
    sorted by revenue desc, n_name asc."""
    rk = region.filter(pc.equal(region.column("r_name"), region_name)) \
        .column("r_regionkey").to_pylist()
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=pa.array(rk, pa.int32())))
    key2name = dict(zip(nat.column("n_nationkey").to_pylist(),
                        nat.column("n_name").to_pylist()))
    keys_ref = ray.put(np.asarray(sorted(key2name), np.int32))

    def _cust_filter(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        m = pc.is_in(batch.column("c_nationkey"),
                     value_set=pa.array(keys, pa.int32()))
        t = batch.filter(m)
        return pa.table({"o_custkey": t.column("c_custkey"),
                         "c_nationkey": t.column("c_nationkey")})

    cust = customer.select_columns(["c_custkey", "c_nationkey"]) \
        .map_batches(_cust_filter, batch_format="pyarrow",
                     zero_copy_batch=True)
    lo = pa.scalar(np.datetime64(date_lo, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"), pa.timestamp("us"))
    ordr = orders.select_columns(["o_orderkey", "o_custkey",
                                  "o_orderdate"]) \
        .map_batches(lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("o_orderdate"), lo),
            pc.less(b.column("o_orderdate"), hi)))
            .select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
    ordr_nat = hash_join(ordr, cust, on="o_custkey") \
        .select_columns(["o_orderkey", "c_nationkey"])
    line = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(lambda b: pa.table({
            "o_orderkey": b.column("l_orderkey"),
            "rev": pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")))}),
            batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(line, ordr_nat, on="o_orderkey")

    def _nat_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"c_nationkey": pa.array([], pa.int32()),
                             "rev": pa.array([], pa.float64())})
        g = pa.TableGroupBy(batch, ["c_nationkey"]).aggregate(
            [("rev", "sum")])
        return pa.table({"c_nationkey": g.column("c_nationkey"),
                         "rev": g.column("rev_sum")})

    # nation-count-bounded partials: final sum on the driver is O(25)
    parts = list(joined.map_batches(
        _nat_partial, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_format="pyarrow"))
    acc: dict[int, float] = {}
    for t in parts:
        for nk, r in zip(t.column("c_nationkey").to_pylist(),
                         t.column("rev").to_pylist()):
            acc[nk] = acc.get(nk, 0.0) + r
    rows = sorted(((round(v, 2), key2name[nk]) for nk, v in acc.items()),
                  key=lambda x: (-x[0], x[1]))
    return pa.table({"n_name": pa.array([r[1] for r in rows], pa.string()),
                     "revenue": pa.array([r[0] for r in rows],
                                         pa.float64())})


def _set_op(left: "ray.data.Dataset", right: "ray.data.Dataset",
            keys: list[str], keep_both: bool,
            num_partitions: int | None = None) -> "ray.data.Dataset":
    """Shared kernel for INTERSECT / EXCEPT (DISTINCT set semantics, as
    in SQL): tag each side (0 = left, 1 = right), union, ONE hash
    exchange on the key columns, then a per-partition vectorized pass —
    lexsort by encoded key codes, run-slice, keep one representative
    row per key where (keep_both ? both tags present : only tag 0).
    Output columns are exactly ``keys`` (set semantics drop the rest).
    No driver state; the exchange moves each row once."""
    def _tagger(v: int):
        def _tag(b: pa.Table) -> pa.Table:
            return b.append_column(
                "__tag", pa.array(np.full(b.num_rows, v, np.int8)))
        return _tag

    lt = left.select_columns(keys).map_batches(
        _tagger(0), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns(keys).map_batches(
        _tagger(1), batch_format="pyarrow", zero_copy_batch=True)
    sch = left.schema()
    key_types = {k: sch.types[sch.names.index(k)] for k in keys}

    def _part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({k: pa.array([], key_types[k]) for k in keys})
        codes = []
        for k in keys:
            enc = pc.dictionary_encode(batch.column(k)).combine_chunks()
            codes.append(np.asarray(enc.indices.to_numpy(
                zero_copy_only=False), np.int64))
        tag = np.asarray(batch.column("__tag").to_numpy(
            zero_copy_only=False), np.int8)
        order = np.lexsort(tuple(reversed(codes)))
        sorted_codes = [c[order] for c in codes]
        from web_search_engine_ray.functions.grouping import group_slices
        starts, ends = group_slices(sorted_codes)
        tag_sorted = tag[order]
        has_l = np.minimum.reduceat(tag_sorted, starts) == 0
        has_r = np.maximum.reduceat(tag_sorted, starts) == 1
        keep = (has_l & has_r) if keep_both else (has_l & ~has_r)
        reps = order[starts[keep]]
        t = batch.take(pa.array(reps, pa.int64()))
        return t.select(keys)

    both = lt.union(rt)
    return hash_partition(both, keys, num_partitions).map_batches(
        _part, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True)


def dataset_intersect(left: "ray.data.Dataset", right: "ray.data.Dataset",
                      keys: list[str],
                      num_partitions: int | None = None) -> "ray.data.Dataset":
    """SQL ``INTERSECT`` (distinct keys present on BOTH sides) as one
    hash exchange + run-sliced pass; see _set_op."""
    return _set_op(left, right, keys, keep_both=True,
                   num_partitions=num_partitions)


def dataset_except(left: "ray.data.Dataset", right: "ray.data.Dataset",
                   keys: list[str],
                   num_partitions: int | None = None) -> "ray.data.Dataset":
    """SQL ``EXCEPT`` (distinct left keys absent from right) as one
    hash exchange + run-sliced pass; see _set_op."""
    return _set_op(left, right, keys, keep_both=False,
                   num_partitions=num_partitions)


def top_suppliers(lineitem: "ray.data.Dataset", supplier: pa.Table,
                  k: int = 10) -> pa.Table:
    """Top-k suppliers by revenue (sum of extendedprice*(1-discount)),
    ties by s_suppkey — the supplier-side revenue ranking.

    Shape: per-batch Arrow combiner keyed on l_suppkey (each batch
    collapses to its distinct-supplier count), driver sum over the
    supplier-count-bounded partial rows, then the (tiny) supplier
    dimension table joined driver-side for names — the fact table is
    never shuffled and the dimension never leaves the driver.  At a
    supplier cardinality where the partials stop being small, swap the
    driver sum for one hash exchange (the pricing_summary pattern)."""
    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        t = batch.select(["l_suppkey"]).append_column("rev", rev)
        g = pa.TableGroupBy(t, ["l_suppkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_suppkey", "rev"])

    acc: dict[int, float] = {}
    for t in lineitem.select_columns(
            ["l_suppkey", "l_extendedprice", "l_discount"]).map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None):
        for sk, r in zip(t.column("l_suppkey").to_pylist(),
                         t.column("rev").to_pylist()):
            acc[sk] = acc.get(sk, 0.0) + r
    names = dict(zip(supplier.column("s_suppkey").to_pylist(),
                     supplier.column("s_name").to_pylist()))
    rows = sorted(((round(v, 2), sk) for sk, v in acc.items()),
                  key=lambda x: (-x[0], x[1]))[:k]
    return pa.table({
        "s_suppkey": pa.array([sk for _, sk in rows], pa.int64()),
        "s_name": pa.array([names.get(sk) for _, sk in rows], pa.string()),
        "revenue": pa.array([v for v, _ in rows], pa.float64())})
