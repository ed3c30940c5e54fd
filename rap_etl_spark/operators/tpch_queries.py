"""TPC-H-shaped multi-join analytical queries (plan-coverage wave 3).

These exercise the full relational pipeline — multi-way joins with mixed
broadcast/shuffle strategies, selective filters feeding pushdown, grouped
aggregation over join output — the shapes Catalyst must get right for the
engine to be usable as a general lakehouse query layer.

Rounding convention: revenue values carry exactly 4 true decimals
(price 2dp x discount 2dp), so per-group sums are rounded to 4dp — the
grid the true value sits on; 2dp WOULD hit exact midpoints where Spark
(half-up) and DuckDB (half-even) disagree. No LIMIT over float-ordered
sums — near-equal revenues could rank differently across engines; the
grouped set is the stable comparison unit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rap_etl_spark.operators.relational import _t


def q3_shipping(spark, sf):
    """Q3 shape: customer ⋈ orders ⋈ lineitem, segment + date filters,
    revenue per order."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1996-06-30")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


def q5_local_supplier(spark, sf):
    """Q5 shape: 6-way join (lineitem⋈orders⋈customer⋈supplier⋈nation⋈region)
    with the local-supplier condition c_nationkey = s_nationkey."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31")
    )
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy("r_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q10_returned_items(spark, sf):
    """Q10 shape: revenue lost to returned items per customer."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


def q_fn_map(spark, sf):
    """F7 map functions. Oracled by VALUE: the DuckDB SQL reproduces the
    same outputs from the base columns (element_at(m,'lang') == lang, two
    keys, pipe-joined values) without needing DuckDB's map type."""
    d = _t(spark, sf, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.map_values(m), "|").alias("vals"),
    )


def q_map_in_arrow(spark, sf):
    """V5 mapInArrow: whole-partition token transform at the Arrow batch
    level. Oracled by value (first word uppercased reproduces in SQL)."""
    import pyarrow as pa

    d = _t(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )

    def upper_first(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            words = tbl.column("words").to_pylist()
            firsts = [w[0].upper() if w else "" for w in words]
            out = pa.table(
                {
                    "doc_id": tbl.column("doc_id"),
                    "first_upper": pa.array(firsts, pa.string()),
                }
            )
            yield from out.to_batches()

    return d.mapInArrow(upper_first, schema="doc_id bigint, first_upper string")


TPCH_QUERIES = {
    "q3_shipping": q3_shipping,
    "q5_local_supplier": q5_local_supplier,
    "q10_returned_items": q10_returned_items,
    "fn_map": q_fn_map,
    "udf_map_in_arrow": q_map_in_arrow,
}

TPCH_ORACLES = {
    "q3_shipping": (
        "SELECT o_orderkey, o_orderpriority,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM customer JOIN orders ON c_custkey = o_custkey"
        " JOIN lineitem ON o_orderkey = l_orderkey"
        " WHERE c_mktsegment = 'BUILDING'"
        " AND o_orderdate < TIMESTAMP '1997-01-01'"
        " AND l_shipdate > TIMESTAMP '1996-06-30'"
        " GROUP BY o_orderkey, o_orderpriority"
    ),
    "q5_local_supplier": (
        "SELECT r_name, n_name,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,"
        " count(*) AS n_items"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'"
        " GROUP BY r_name, n_name"
    ),
    "udf_map_in_arrow": (
        "SELECT doc_id, upper(coalesce(string_split(text, ' ')[1], ''))"
        " AS first_upper FROM documents"
    ),
    "fn_map": (
        "SELECT doc_id, lang AS m_lang, 2 AS n_keys,"
        " lang || '|' || source AS vals FROM documents"
    ),
    "q10_returned_items": (
        "SELECT c_custkey, c_name, n_name,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM customer JOIN orders ON c_custkey = o_custkey"
        " JOIN lineitem ON o_orderkey = l_orderkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " WHERE l_returnflag = 'R'"
        " GROUP BY c_custkey, c_name, n_name"
    ),
}
