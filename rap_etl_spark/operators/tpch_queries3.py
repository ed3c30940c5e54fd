"""TPC-H wave 5 (round 2): the ten remaining query shapes — q2, q8, q9,
q11, q12, q13, q16, q19, q20, q21 — completing all 22.

The testdata is a slimmed TPC-H (no partsupp, no comment/container/
shipmode/commitdate columns), so each query keeps the ORIGINAL's operator
composition — correlated min subquery (q2), conditional market-share ratio
(q8), profit rollup (q9), HAVING-vs-global-scalar (q11), lateness-class
conditional counts (q12), outer-join double aggregation (q13), NOT-IN +
count-distinct (q16), OR-of-ANDs pushdown (q19), nested IN with grouped
threshold (q20), EXISTS/NOT-EXISTS on sibling lineitems (q21) — re-grounded
on existing columns, exactly as waves 3+4 did (q7 NATION_* names, q22
mktsegment). Every query is value-oracled against DuckDB.

Scale notes are per query; the common rules: dims (region, nation,
supplier, part at these shapes) broadcast; fact-fact joins are equi-joins
on keys Spark plans as shuffle joins with AQE; aggregates are partial
(map-side combine) before the shuffle; all money sums are rounded in BOTH
engines to absorb summation-order FP noise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rap_etl_spark.operators.relational import _t


def q2_min_acctbal_supplier(spark, sf):
    """q2 shape: for STANDARD parts of size 15 shipped into EUROPE, the
    minimum-acctbal supplier per part (correlated min subquery). partsupp
    doesn't exist, so "supplies the part" = "shipped it" (lineitem pair).
    Plan: dims broadcast onto lineitem, pair-distinct, then a per-part min
    joined back on equality — two shuffles on p_partkey, no window."""
    cand = (
        _t(spark, sf, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf, "part").filter(
                    (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(_t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
        .distinct()
    )
    best = cand.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return cand.join(
        best,
        (F.col("p_partkey") == F.col("bp"))
        & (F.col("s_acctbal") == F.col("min_bal")),
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")


def q8_market_share(spark, sf):
    """q8 shape: NATION_5 suppliers' revenue share of ECONOMY-part volume
    sold to EUROPE customers, per order year — the conditional-sum ratio.
    Both engines round to 6; the ratio's summation-order noise is ~1e-10."""
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li = (
        _t(spark, sf, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            _t(spark, sf, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _t(spark, sf, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf, "nation").select(
                    F.col("n_nationkey").alias("cn_key"),
                    F.col("n_regionkey").alias("cn_region"),
                )
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .join(
            F.broadcast(
                _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(
            F.broadcast(_t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf, "nation").select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
    )
    return (
        li.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            F.when(F.col("supp_nation") == "NATION_5", vol)
            .otherwise(0.0)
            .alias("n5_vol"),
        )
        .groupBy("o_year")
        .agg(
            F.round(F.sum("n5_vol") / F.sum("vol"), 6).alias("mkt_share")
        )
    )


def q9_profit(spark, sf):
    """q9 shape: profit rollup by supplier nation and year over parts whose
    name contains 'red' (no ps_supplycost column exists, so profit is the
    discounted revenue term only)."""
    return (
        _t(spark, sf, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf, "part").filter(F.col("p_name").like("%red%"))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(_t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            _t(spark, sf, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
    )


def q11_important_parts(spark, sf):
    """q11 shape: per-part value held by NATION_7 suppliers, keeping parts
    above a fixed fraction of the total (grouped sum vs global scalar
    subquery). The threshold compare uses the UNROUNDED sums in both
    engines; only the emitted value is rounded."""
    v = (
        _t(spark, sf, "lineitem")
        .join(
            F.broadcast(_t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("value")
        )
    )
    total = v.agg(F.sum("value").alias("t"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("t") * 0.002)
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


def q12_lateness_priority(spark, sf):
    """q12 shape: conditional priority counts per shipping class. No
    shipmode/commitdate columns — the class is shipping lateness (shipped
    more than 90 days after the order date = 'SLOW')."""
    j = _t(spark, sf, "lineitem").join(
        _t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.filter(F.year("l_shipdate") == 1997)
        .select(
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                "SLOW",
            )
            .otherwise("FAST")
            .alias("ship_class"),
            F.when(high, 1).otherwise(0).alias("h"),
            F.when(high, 0).otherwise(1).alias("l"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum("h").alias("high_line_count"),
            F.sum("l").alias("low_line_count"),
        )
    )


def q13_order_distribution(spark, sf):
    """q13 shape: customer distribution by order count — left outer join
    with an EXTRA join-side predicate (non-urgent orders only), then two
    stacked aggregations."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q16_supplier_cnt(spark, sf):
    """q16 shape: distinct suppliers per (brand, type, size) over selected
    sizes, excluding one brand and two types, minus suppliers filtered by a
    NOT IN subquery (negative-balance stand-in for the complaints LIKE)."""
    bad = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    return (
        _t(spark, sf, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf, "part").filter(
                    (F.col("p_brand") != "Brand#1")
                    & (~F.col("p_type").isin("PROMO", "ECONOMY"))
                    & (F.col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 36))
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("bad_key"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q19_or_of_ands(spark, sf):
    """q19 shape: disjunction of brand/size/quantity conjunctions — the
    predicate-pushdown stress test (each arm prunes on both tables)."""
    j = _t(spark, sf, "lineitem").join(
        F.broadcast(_t(spark, sf, "part")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    arm1 = (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(5, 25)
        & F.col("l_quantity").between(10, 35)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(10, 40)
        & F.col("l_quantity").between(20, 50)
    )
    return j.filter(arm1 | arm2 | arm3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def q20_volume_suppliers(spark, sf):
    """q20 shape: suppliers qualified through a nested IN — shipped more
    than 100 units of red-named parts in 1997 — restricted to one region
    (availqty/partsupp doesn't exist; the grouped-HAVING threshold keeps
    the nested-subquery composition)."""
    qualifying = (
        _t(spark, sf, "lineitem")
        .filter(F.year("l_shipdate") == 1997)
        .join(
            F.broadcast(
                _t(spark, sf, "part").filter(F.col("p_name").like("red%"))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    nkeys = (
        _t(spark, sf, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey")
    )
    return (
        _t(spark, sf, "supplier")
        .join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(nkeys),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


def q21_waiting_supplier(spark, sf):
    """q21 shape: per-supplier count of finished multi-supplier orders
    where THIS supplier shipped late (>60 days after the order date) and no
    OTHER supplier did — EXISTS and NOT EXISTS over sibling lineitems,
    planned as a left-semi and a left-anti join with a non-equi residual
    (suppkey inequality) alongside the orderkey equi key."""
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late1 = (
        li.join(
            _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    sib = li.select(
        F.col("l_orderkey").alias("s_ok"),
        F.col("l_suppkey").alias("s_sk"),
        F.col("l_shipdate").alias("s_ship"),
    )
    exists_other = late1.join(
        sib,
        (F.col("l_orderkey") == F.col("s_ok"))
        & (F.col("l_suppkey") != F.col("s_sk")),
        "left_semi",
    )
    none_other_late = exists_other.join(
        sib,
        (F.col("l_orderkey") == F.col("s_ok"))
        & (F.col("l_suppkey") != F.col("s_sk"))
        & (
            F.col("s_ship")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_anti",
    )
    return (
        none_other_late.join(
            F.broadcast(
                _t(spark, sf, "supplier")
                .join(
                    F.broadcast(
                        _t(spark, sf, "nation").filter(
                            F.col("n_name") == "NATION_3"
                        )
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .select("s_suppkey", "s_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q_time_travel(spark, sf):
    """S2 snapshot read, oracled BY VALUE: drive the lake table through two
    version-conditional merges (same derivation as cdc_merge), then read
    AS OF the FIRST snapshot — the result must be the LWW of batch 0
    alone, proving historical reads are immutable under later commits.
    The oracle is that earlier state's plain window statement."""
    import os
    import tempfile

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
    work = tempfile.mkdtemp(prefix="rap-etl-time-travel-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        snap0 = table.snapshot_id()
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        rows = (
            table.read(snapshot_id=snap0)
            .select("doc_id", "lsn", "price")
            .collect()
        )
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_time_travel_ts(spark, sf):
    """AS-OF-TIMESTAMP time travel (lake.read_as_of): same two-merge
    drive as time_travel_read, but the historical read resolves by the
    first commit's microsecond wall-clock stamp instead of its snapshot
    id. The strictly-monotonic committed_at_us (parent+1 floor) is what
    makes this deterministic even when both commits land in the same
    second — the oracle is batch 0's plain LWW statement."""
    import os
    import tempfile

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
    work = tempfile.mkdtemp(prefix="rap-etl-time-travel-ts-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        ts0 = table._manifest()["committed_at_us"]
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        rows = (
            table.read_as_of(ts0)
            .select("doc_id", "lsn", "price")
            .collect()
        )
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES3 = {
    "time_travel_read": q_time_travel,
    "time_travel_ts": q_time_travel_ts,
    "q2_min_supplier": q2_min_acctbal_supplier,
    "q8_market_share": q8_market_share,
    "q9_profit": q9_profit,
    "q11_important_parts": q11_important_parts,
    "q12_lateness_priority": q12_lateness_priority,
    "q13_order_distribution": q13_order_distribution,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q19_or_of_ands": q19_or_of_ands,
    "q20_volume_suppliers": q20_volume_suppliers,
    "q21_waiting_supplier": q21_waiting_supplier,
}

TPCH_ORACLES3 = {
    "time_travel_ts": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_totalprice AS price,"
        " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
        " FROM orders WHERE o_orderkey % 2 = 0),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
    ),
    "time_travel_read": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_totalprice AS price,"
        " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
        " FROM orders WHERE o_orderkey % 2 = 0),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
    ),
    "q2_min_supplier": (
        "WITH cand AS (SELECT DISTINCT p_partkey, p_name, s_name, s_acctbal,"
        " n_name FROM lineitem"
        " JOIN part ON l_partkey = p_partkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE')"
        " SELECT s_acctbal, s_name, n_name, p_partkey, p_name FROM cand"
        " WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2"
        "   WHERE c2.p_partkey = cand.p_partkey)"
    ),
    "q8_market_share": (
        "SELECT year(o_orderdate) AS o_year,"
        " round(sum(CASE WHEN n2.n_name = 'NATION_5'"
        "   THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)"
        " / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share"
        " FROM lineitem"
        " JOIN part ON l_partkey = p_partkey"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation n1 ON c_nationkey = n1.n_nationkey"
        " JOIN region ON n1.n_regionkey = r_regionkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation n2 ON s_nationkey = n2.n_nationkey"
        " WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'"
        " GROUP BY o_year"
    ),
    "q9_profit": (
        "SELECT n_name AS nation, year(o_orderdate) AS o_year,"
        " round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit"
        " FROM lineitem"
        " JOIN part ON l_partkey = p_partkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " JOIN orders ON l_orderkey = o_orderkey"
        " WHERE p_name LIKE '%red%'"
        " GROUP BY n_name, year(o_orderdate)"
    ),
    "q11_important_parts": (
        "WITH v AS (SELECT l_partkey,"
        " sum(l_extendedprice * (1 - l_discount)) AS value"
        " FROM lineitem"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " WHERE n_name = 'NATION_7' GROUP BY l_partkey)"
        " SELECT l_partkey, round(value, 2) AS value FROM v"
        " WHERE value > (SELECT sum(value) * 0.002 FROM v)"
    ),
    "q12_lateness_priority": (
        "SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY"
        " THEN 'SLOW' ELSE 'FAST' END AS ship_class,"
        " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        "   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,"
        " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
        "   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " WHERE year(l_shipdate) = 1997"
        " GROUP BY ship_class"
    ),
    "q13_order_distribution": (
        "SELECT c_count, count(*) AS custdist FROM ("
        " SELECT c_custkey, count(o_orderkey) AS c_count"
        " FROM customer LEFT OUTER JOIN orders"
        " ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'"
        " GROUP BY c_custkey) GROUP BY c_count"
    ),
    "q16_supplier_cnt": (
        "SELECT p_brand, p_type, p_size,"
        " count(DISTINCT l_suppkey) AS supplier_cnt"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " WHERE p_brand <> 'Brand#1'"
        " AND p_type NOT IN ('PROMO', 'ECONOMY')"
        " AND p_size IN (1, 5, 9, 14, 20, 25, 30, 36)"
        " AND l_suppkey NOT IN"
        "   (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)"
        " GROUP BY p_brand, p_type, p_size"
    ),
    "q19_or_of_ands": (
        "SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 10"
        "   AND l_quantity BETWEEN 1 AND 20)"
        " OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 25"
        "   AND l_quantity BETWEEN 10 AND 35)"
        " OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 40"
        "   AND l_quantity BETWEEN 20 AND 50)"
    ),
    "q20_volume_suppliers": (
        "SELECT s_name, round(s_acctbal, 2) AS s_acctbal FROM supplier"
        " WHERE s_suppkey IN ("
        "   SELECT l_suppkey FROM lineitem"
        "   JOIN part ON l_partkey = p_partkey"
        "   WHERE p_name LIKE 'red%' AND year(l_shipdate) = 1997"
        "   GROUP BY l_suppkey HAVING sum(l_quantity) > 100)"
        " AND s_nationkey IN"
        "   (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)"
    ),
    "q21_waiting_supplier": (
        "SELECT s_name, count(*) AS numwait"
        " FROM supplier"
        " JOIN lineitem l1 ON s_suppkey = l1.l_suppkey"
        " JOIN orders ON o_orderkey = l1.l_orderkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'"
        " AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY"
        " AND EXISTS (SELECT 1 FROM lineitem l2"
        "   WHERE l2.l_orderkey = l1.l_orderkey"
        "   AND l2.l_suppkey <> l1.l_suppkey)"
        " AND NOT EXISTS (SELECT 1 FROM lineitem l3"
        "   WHERE l3.l_orderkey = l1.l_orderkey"
        "   AND l3.l_suppkey <> l1.l_suppkey"
        "   AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)"
        " GROUP BY s_name"
    ),
}


def q_sessionize(spark, sf):
    """Batch sessionization of the event stream (the analytics twin of the
    R4 streaming session window): a new session starts when a user's
    inter-event gap exceeds 30 minutes — lag + running-sum-of-flags, the
    canonical two-window composition — then per-session count and
    duration. One shuffle on user_id; both windows share the same
    partitioning so the second is sort-only. Ordering ties break on
    event_id, making the result deterministic and exactly oracle-able."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integral MICROSECOND epochs on both engines (the ts column carries
    # sub-second precision; seconds-truncating unix_timestamp vs DuckDB's
    # fractional epoch() would disagree); session tz pinned UTC
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_flag = F.when(
        epoch - F.lag(epoch).over(w) > 1_800_000_000, 1
    ).otherwise(0)
    with_sess = ev.select(
        "user_id", "ts", "event_id", gap_flag.alias("new_sess")
    ).withColumn("session_id", F.sum("new_sess").over(w))
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.unix_micros(F.col("ts").cast("timestamp")))
            - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
        ).alias("duration_us"),
    )


TPCH_QUERIES3["sessionize"] = q_sessionize
TPCH_ORACLES3["sessionize"] = (
    "WITH flagged AS (SELECT user_id, ts, event_id,"
    " CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000"
    " THEN 1 ELSE 0 END"
    " AS new_sess FROM events WINDOW w AS"
    " (PARTITION BY user_id ORDER BY ts, event_id)),"
    " sess AS (SELECT user_id, ts, CAST(sum(new_sess) OVER"
    " (PARTITION BY user_id ORDER BY ts, event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
    " AS session_id FROM flagged)"
    " SELECT user_id, session_id, count(*) AS n_events,"
    " max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us"
    " FROM sess GROUP BY user_id, session_id"
)


def q_fn_zorder(spark, sf):
    """Z-order clustering key (functions/zorder.py), oracled: the Spark
    bit-interleave expression and the DuckDB SQL are generated from the
    same loop, so any bit-position error breaks the value hash. Key domain
    quantized to 16 bits per dimension via pmod."""
    from rap_etl_spark.functions.zorder import zorder_key

    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        zorder_key(
            F.pmod(F.col("o_custkey"), F.lit(65536)),
            F.pmod(F.col("o_orderkey"), F.lit(65536)),
        ).alias("zkey"),
    )


def _zorder_oracle() -> str:
    from rap_etl_spark.functions.zorder import zorder_sql

    expr = zorder_sql("(o_custkey % 65536)", "(o_orderkey % 65536)")
    return f"SELECT o_orderkey, {expr} AS zkey FROM orders"


TPCH_QUERIES3["fn_zorder"] = q_fn_zorder
TPCH_ORACLES3["fn_zorder"] = _zorder_oracle()


def _alias_q1() -> None:
    """q1 has always been implemented as agg_pricing_summary (wave 1, the
    literal Q1 shape); register it under its TPC-H name too so the q1..q22
    set is visible by name."""
    from rap_etl_spark.operators.relational import ORACLES, QUERIES

    TPCH_QUERIES3["q1_pricing_summary"] = QUERIES["agg_pricing_summary"]
    TPCH_ORACLES3["q1_pricing_summary"] = ORACLES["agg_pricing_summary"]


_alias_q1()


# --------------------------------------------------------------------------
# round-2 session 3: sliding window, deterministic mode, generator shape
# --------------------------------------------------------------------------
def q_stream_sliding(spark, sf):
    """R3 sliding-window aggregate in batch mode (window size 10m, slide
    5m — each event lands in exactly two windows), the same plan shape
    Structured Streaming executes per micro-batch. Oracled by expanding
    each event to its two epoch-aligned slide slots."""
    from pyspark.sql import functions as F

    from rap_etl_spark.operators.relational import _t

    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_val"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "cnt",
            "sum_val",
        )
    )


TPCH_QUERIES3["stream_sliding"] = q_stream_sliding
TPCH_ORACLES3["stream_sliding"] = (
    "WITH s AS (SELECT event_type, value,"
    " UNNEST([time_bucket(INTERVAL 5 MINUTE, ts),"
    "         time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE])"
    "   AS win_start FROM events)"
    " SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,"
    " event_type, count(*) AS cnt, round(sum(value), 2) AS sum_val"
    " FROM s GROUP BY win_start, event_type"
)


def q_agg_mode(spark, sf):
    """Deterministic MODE per group (most frequent lang per source, ties
    broken lexicographically) — the count+rank formulation both engines
    can state identically, unlike built-in mode()'s unspecified ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rap_etl_spark.operators.relational import _t

    d = _t(spark, sf, "documents")
    counts = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("lang").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("mode_lang"), "n")
    )


TPCH_QUERIES3["agg_mode"] = q_agg_mode
TPCH_ORACLES3["agg_mode"] = (
    "WITH c AS (SELECT source, lang, count(*) AS n FROM documents"
    "   GROUP BY source, lang),"
    " r AS (SELECT *, row_number() OVER (PARTITION BY source"
    "   ORDER BY n DESC, lang ASC) AS rn FROM c)"
    " SELECT source, lang AS mode_lang, n FROM r WHERE rn = 1"
)


def q_fn_posexplode(spark, sf):
    """Generator plan shape: posexplode of the whitespace token array with
    0-based positions (2% doc sample keeps the compare tractable)."""
    from pyspark.sql import functions as F

    from rap_etl_spark.operators.relational import _t

    d = _t(spark, sf, "documents").filter(F.col("doc_id") % 50 == 0)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )


TPCH_QUERIES3["fn_posexplode"] = q_fn_posexplode
TPCH_ORACLES3["fn_posexplode"] = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks"
    "   FROM documents WHERE doc_id % 50 = 0)"
    " SELECT doc_id, i - 1 AS pos, toks[i] AS word"
    " FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)"
)
