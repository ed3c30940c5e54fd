"""TPC-H-shaped queries, wave 4: subquery / existence / ratio shapes.

Adds the plan shapes wave 3 (tpch_queries.py) did not cover: semi join with
a non-equi residual (Q4), scan-only selective aggregate (Q6), multi-alias
self-join of a dimension (Q7), conditional-aggregate ratio (Q14), scalar
subquery over an aggregate (Q15), correlated-aggregate threshold (Q17),
HAVING-IN pipeline (Q18), anti join + scalar subquery (Q22-shape), and an
end-to-end `cdc_merge` that drives the real lake table through
LWW → version-conditional MERGE and is oracled by a plain window query —
the SQL statement of the reference's diff-then-publish convergence
guarantee (SURVEY.md §1.1, C4).

Float-stability conventions follow tpch_queries.py: sums of 4-true-decimal
products rounded to 4dp in both engines; thresholds compared against
aggregates are rounded to 6dp in both engines so an ulp of cross-engine
summation difference cannot flip a boundary row.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from rap_etl_spark.operators.relational import _t

def _rev():
    # built lazily: Column construction needs an active SparkContext
    return F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)


def q4_order_priority(spark, sf):
    """Q4 shape: orders with at least one late-shipped item (semi join with
    an extra non-equi predicate), counted per priority."""
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1996-03-31")
    )
    li = _t(spark, sf, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


def q6_forecast_revenue(spark, sf):
    """Q6 shape: scan-only selective aggregate — the predicate set must
    fully push down to the parquet scan (asserted in test_plan_shapes)."""
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))


def q7_volume_shipping(spark, sf):
    """Q7 shape: nation self-aliased twice (supplier side / customer side),
    bidirectional pair filter, revenue per (nation pair, ship year)."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_rev().alias("revenue"))


def q14_promo_effect(spark, sf):
    """Q14 shape: conditional-aggregate ratio over a fact⋈dim join."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-06-01")
    )
    p = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


def q15_top_supplier(spark, sf):
    """Q15 shape: scalar subquery over an aggregate — supplier(s) whose
    quarterly revenue equals the maximum."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy("l_suppkey").agg(_rev().alias("total_revenue"))
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = _t(spark, sf, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.l_suppkey)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity(spark, sf):
    """Q17 shape: correlated aggregate threshold — items of one brand whose
    quantity is below 20% of that part's average quantity. The threshold is
    rounded to 6dp in both engines (boundary-ulp stability)."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#23")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresh, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def q18_large_orders(spark, sf):
    """Q18 shape: HAVING-filtered IN-subquery feeding a 3-way join.
    sum(l_quantity) is integral-valued, so the > threshold is fp-exact."""
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 170)
        .select("l_orderkey", "sum_qty")
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("total_qty"),
        )
    )


def q22_idle_customers(spark, sf):
    """Q22 shape: customers above the average positive balance with no
    orders since 1999 (anti join + scalar-subquery threshold, rounded 6dp)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def q_cdc_merge(spark, sf):
    """C4 end-to-end, oracled: drive the REAL lake table through two
    version-conditional merges and return the final state.

    Events are derived deterministically from `orders` (doc_id = custkey,
    lsn = orderkey, op = D on every 10th orderkey) and split into two
    batches by orderkey parity — each batch holds interleaved LSNs for the
    same keys, so the final state equals the global LWW ONLY because the
    merge is conditional on the stored row version (lake.py merge). The
    oracle is the plain window statement of that guarantee."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_totalprice").alias("price"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-cdc-merge-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        for batch_id in (0, 1):
            batch = ev.filter(F.col("lsn") % 2 == batch_id)
            table.merge(lww_latest(batch), batch_id=batch_id)
        # materialize before deleting the on-disk table: the returned frame
        # must stay collectible after cleanup
        rows = table.read().select("doc_id", "lsn", "price").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2 = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q22_idle_customers": q22_idle_customers,
    "cdc_merge": q_cdc_merge,
}

TPCH_ORACLES2 = {
    "q4_order_priority": (
        "SELECT o_orderpriority, count(*) AS n_orders FROM orders"
        " WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'"
        " AND EXISTS (SELECT 1 FROM lineitem"
        "   WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)"
        " GROUP BY o_orderpriority"
    ),
    "q6_forecast_revenue": (
        "SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue"
        " FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l_shipdate < TIMESTAMP '1997-01-01'"
        " AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"
    ),
    "q7_volume_shipping": (
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,"
        " year(l_shipdate) AS l_year,"
        " round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation n1 ON s_nationkey = n1.n_nationkey"
        " JOIN nation n2 ON c_nationkey = n2.n_nationkey"
        " WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')"
        " OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')"
        " GROUP BY supp_nation, cust_nation, l_year"
    ),
    "q14_promo_effect": (
        "SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'"
        " THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)"
        " / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " WHERE l_shipdate >= TIMESTAMP '1996-03-01'"
        " AND l_shipdate < TIMESTAMP '1996-06-01'"
    ),
    "q15_top_supplier": (
        "WITH revenue AS ("
        " SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4)"
        " AS total_revenue FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey)"
        " SELECT s_suppkey, s_name, total_revenue"
        " FROM supplier JOIN revenue ON s_suppkey = l_suppkey"
        " WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"
    ),
    "q17_small_quantity": (
        "SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " JOIN (SELECT l_partkey AS t_partkey,"
        "   round(0.2 * avg(l_quantity), 6) AS qty_threshold"
        "   FROM lineitem GROUP BY l_partkey) t ON l_partkey = t_partkey"
        " WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold"
    ),
    "q18_large_orders": (
        "SELECT c_name, c_custkey, o_orderkey,"
        " strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice,"
        " CAST(sum_qty AS DOUBLE) AS total_qty"
        " FROM orders"
        " JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem"
        "   GROUP BY l_orderkey HAVING sum(l_quantity) > 170) big"
        " ON o_orderkey = big.l_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
    ),
    "q22_idle_customers": (
        "SELECT c_mktsegment, count(*) AS n_cust,"
        " round(sum(c_acctbal), 2) AS total_bal FROM customer"
        " WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer"
        "   WHERE c_acctbal > 0.0)"
        " AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey"
        "   AND o_orderdate >= TIMESTAMP '1999-01-01')"
        " GROUP BY c_mktsegment"
    ),
    "cdc_merge": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_totalprice AS price,"
        " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
        " FROM orders),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
    ),
}


# --------------------------------------------------------------------------
# wave 5: remaining aggregate/window/sort shapes
# --------------------------------------------------------------------------
def q_agg_cube(spark, sf):
    """A4 cube: all 4 grouping combinations of (returnflag, linestatus)."""
    li = _t(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_agg_grouping_sets(spark, sf):
    """A4 GROUPING SETS via SQL: per-priority, per-status, and grand total
    in one pass (the non-rollup subset selection rollup/cube can't express)."""
    _t(spark, sf, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        "SELECT o_orderpriority, o_orderstatus, count(*) AS cnt"
        " FROM v_orders"
        " GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"
    )


def q_win_first_last(spark, sf):
    """W2 first/last over an ordered frame: each order's smallest- and
    largest-quantity line item (full-partition frame for last_value)."""
    li = _t(spark, sf, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_quantity", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_quantity").over(w).alias("min_qty"),
        F.last("l_quantity").over(w).alias("max_qty"),
    )


def q_sort_nulls(spark, sf):
    """O1 null ordering: explicit NULLS FIRST/LAST must agree cross-engine."""
    d = _t(spark, sf, "documents")
    nullable = d.withColumn(
        "maybe", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("n_chars"))
    )
    return nullable.select("doc_id", "maybe").orderBy(
        F.col("maybe").asc_nulls_first(), F.col("doc_id").asc()
    )


def q_agg_string(spark, sf):
    """A5 ordered string aggregation: deterministic per-group concatenation."""
    d = _t(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.array_join(F.sort_array(F.collect_list(F.col("lang"))), "|").alias("langs"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# round 2: incremental CDC read (table_changes) driven end-to-end and oracled
# --------------------------------------------------------------------------
def q_cdc_table_changes(spark, sf):
    """Incremental CDC read, oracled end-to-end: replay the same two-batch
    interleaved-LSN workload as `cdc_merge`, then ask the LAKE itself what
    changed between the batch-0 snapshot and the final snapshot
    (lake.py table_changes — bucket-pruned snapshot diff). The oracle is
    pure SQL: LWW state after batch 0 vs final LWW state, full-outer
    joined and classified into insert/delete/update_pre/update_post."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_totalprice").alias("price"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_change_type", T.StringType(), False),
            T.StructField("_change_lsn", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-cdc-changes-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        sid1 = None
        for batch_id in (0, 1):
            batch = ev.filter(F.col("lsn") % 2 == batch_id)
            table.merge(lww_latest(batch), batch_id=batch_id)
            if batch_id == 0:
                sid1 = table.snapshot_id()
        rows = table.table_changes(sid1).collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["cdc_table_changes"] = q_cdc_table_changes

TPCH_ORACLES2["cdc_table_changes"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, o_totalprice AS price,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w1 AS (SELECT * FROM (SELECT ev.*, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev"
    "   WHERE lsn % 2 = 0) t WHERE rn = 1),"
    " w2 AS (SELECT * FROM (SELECT ev.*, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev) t WHERE rn = 1),"
    " l1 AS (SELECT doc_id, lsn, price FROM w1 WHERE op <> 'D'),"
    " l2 AS (SELECT doc_id, lsn, price FROM w2 WHERE op <> 'D'),"
    " j AS (SELECT l1.doc_id AS d1, l1.lsn AS lsn1, l1.price AS p1,"
    "   l2.doc_id AS d2, l2.lsn AS lsn2, l2.price AS p2, w2.lsn AS wlsn2"
    "   FROM l1 FULL OUTER JOIN l2 ON l1.doc_id = l2.doc_id"
    "   LEFT JOIN w2 ON w2.doc_id = COALESCE(l1.doc_id, l2.doc_id))"
    " SELECT d2 AS doc_id, lsn2 AS lsn, p2 AS price,"
    "   'insert' AS _change_type, lsn2 AS _change_lsn FROM j"
    "   WHERE d1 IS NULL AND d2 IS NOT NULL"
    " UNION ALL"
    " SELECT d1, lsn1, p1, 'delete', wlsn2 FROM j"
    "   WHERE d1 IS NOT NULL AND d2 IS NULL"
    " UNION ALL"
    " SELECT d1, lsn1, p1, 'update_preimage', lsn2 FROM j"
    "   WHERE d1 IS NOT NULL AND d2 IS NOT NULL AND lsn1 <> lsn2"
    " UNION ALL"
    " SELECT d1, lsn2, p2, 'update_postimage', lsn2 FROM j"
    "   WHERE d1 IS NOT NULL AND d2 IS NOT NULL AND lsn1 <> lsn2"
)


TPCH_QUERIES2.update(
    {
        "agg_cube": q_agg_cube,
        "agg_grouping_sets": q_agg_grouping_sets,
        "win_first_last": q_win_first_last,
        "sort_nulls": q_sort_nulls,
        "agg_string": q_agg_string,
    }
)

TPCH_ORACLES2.update(
    {
        "agg_cube": (
            "SELECT l_returnflag, l_linestatus, count(*) AS cnt,"
            " round(sum(l_quantity), 2) AS sum_qty"
            " FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
        ),
        "agg_grouping_sets": (
            "SELECT o_orderpriority, o_orderstatus, count(*) AS cnt"
            " FROM orders"
            " GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"
        ),
        "win_first_last": (
            "SELECT l_orderkey, l_linenumber,"
            " first_value(l_quantity) OVER w AS min_qty,"
            " last_value(l_quantity) OVER w AS max_qty"
            " FROM lineitem"
            " WINDOW w AS (PARTITION BY l_orderkey"
            "   ORDER BY l_quantity, l_linenumber"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        ),
        "sort_nulls": (
            "SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END"
            " AS maybe FROM documents"
            " ORDER BY maybe ASC NULLS FIRST, doc_id ASC"
        ),
        "agg_string": (
            "SELECT source, string_agg(lang, '|' ORDER BY lang) AS langs,"
            " count(*) AS n FROM documents GROUP BY source"
        ),
    }
)
