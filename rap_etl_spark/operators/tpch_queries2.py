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


def q_cdc_merge(spark, sf, merge_mode="cow"):
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
            spark, os.path.join(work, "t"), schema, n_buckets=8,
            merge_mode=merge_mode,
        )
        for batch_id in (0, 1):
            batch = ev.filter(F.col("lsn") % 2 == batch_id)
            table.merge(lww_latest(batch), batch_id=batch_id)
        if merge_mode == "mor":
            # half the maintenance surface too: fold one batch's deltas
            # down, leave the other stacked — the read must resolve a
            # MIXED base+delta layout to the same answer
            table.materialize_deltas(
                buckets=set(range(table.n_buckets() // 2))
            )
        # materialize before deleting the on-disk table: the returned frame
        # must stay collectible after cleanup
        rows = table.read().select("doc_id", "lsn", "price").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _dml_table(spark, work, sf, merge_mode):
    """Bootstrap a lake table from `customer` (unique keys, append path)."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("bal", T.DoubleType()),
            T.StructField("seg", T.StringType()),
        ]
    )
    rows = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    table = ManifestParquetTable.create(
        spark, os.path.join(work, "t"), schema, n_buckets=8, merge_mode=merge_mode
    )
    table.append(rows, batch_id=0, assume_unique=True)
    return table, schema


def q_dml_delete_where(spark, sf):
    """DELETE FROM ... WHERE through the real lake table (lake.py
    delete_where), MERGE-ON-READ mode: negative-balance rows are erased by
    committing tombstone deltas only, and the read-side resolution must
    equal the plain SQL filter. The GDPR-erasure path, driver-oracled."""
    work = tempfile.mkdtemp(prefix="rap-etl-dml-del-")
    try:
        table, schema = _dml_table(spark, work, sf, "mor")
        table.delete_where("bal < 0.0")
        rows = table.read().select("doc_id", "bal", "seg").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_dml_update_where(spark, sf):
    """UPDATE ... SET ... WHERE through the real lake table (lake.py
    update_where), copy-on-write mode: negative balances zeroed and their
    segment relabeled, only affected buckets rewritten. The scrub/backfill
    path, driver-oracled against the equivalent CASE expression."""
    work = tempfile.mkdtemp(prefix="rap-etl-dml-upd-")
    try:
        table, schema = _dml_table(spark, work, sf, "cow")
        table.update_where(
            "bal < 0.0", {"bal": "0.0", "seg": F.lit("SCRUBBED")}
        )
        rows = table.read().select("doc_id", "bal", "seg").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_dml_delete_dv(spark, sf):
    """DELETE FROM ... WHERE via DELETION VECTORS (lake.py
    delete_where(mode='dv'), Iceberg-v3 position deletes): the commit
    writes one (file, position) parquet and re-points manifest entries —
    no data file is rewritten, no tombstone row is added. Exercised on a
    MIXED base+delta layout: a MoR update first moves AUTOMOBILE winners
    into delta files (stale base versions stay on disk), then two DV
    deletes run back-to-back — the second folds the first's generation —
    and the resolved read must equal the plain update-then-filter SQL.
    Masking every physical version (base AND delta) is the load-bearing
    property the oracle hash witnesses."""
    work = tempfile.mkdtemp(prefix="rap-etl-dml-dv-")
    try:
        table, schema = _dml_table(spark, work, sf, "mor")
        upd = (
            _t(spark, sf, "customer")
            .filter(F.col("c_mktsegment") == "AUTOMOBILE")
            .select(
                F.col("c_custkey").cast("string").alias("doc_id"),
                (F.col("c_acctbal") + F.lit(1000.0)).alias("bal"),
                F.lit("AUTOMOBILE").alias("seg"),
                F.lit(1).cast("long").alias("lsn"),
                F.lit("U").alias("op"),
            )
        )
        table.merge(upd, batch_id=1)
        table.delete_where("bal < 0.0", mode="dv", batch_id=2)
        table.delete_where("seg = 'MACHINERY'", mode="dv", batch_id=3)
        rows = table.read().select("doc_id", "bal", "seg").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_cdc_merge_mor(spark, sf):
    """C4 in MERGE-ON-READ mode (lake.py merge(mode='mor')): identical
    workload and oracle as `cdc_merge` — the write path commits only
    per-bucket delta files (no base rewrite), half the buckets are then
    materialized, and the read-time LWW resolution over the mixed layout
    must still equal the plain-window oracle."""
    return q_cdc_merge(spark, sf, merge_mode="mor")


def q_read_range(spark, sf):
    """Zone-map file skipping end-to-end, oracled (lake.read_range):
    load customers into a real table, sorted+size-bounded compact on the
    balance column (contiguous per-file ranges), then range-read — the
    scan opens only overlapping files (asserted by plan tests); the
    oracle is the plain filter, so the pruning must lose no rows."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable

    src = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("bal", T.DoubleType()),
            T.StructField("seg", T.StringType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-read-range-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=4
        )
        table.append(src, batch_id=0, assume_unique=True)
        table.compact(sort_cols=["bal"], max_rows_per_file=50)
        rows = (
            table.read_range("bal", 1000.0, 3000.0)
            .select("doc_id", "bal", "seg")
            .collect()
        )
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_publish_roundtrip(spark, sf):
    """The sync-to-downstream contract end-to-end, oracled: source table
    driven through two version-conditional merges (same derivation as
    cdc_merge), each batch's changefeed published exactly-once
    (publish.py), a DOWNSTREAM table replays the feed — and the
    downstream state must equal the plain LWW window SQL. Proves the
    whole chain: merge semantics → manifest diff → delta publish →
    downstream apply."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.publish import apply_published, publish_changes

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
    work = tempfile.mkdtemp(prefix="rap-etl-publish-rt-")
    try:
        src = ManifestParquetTable.create(
            spark, os.path.join(work, "src"), schema, n_buckets=8
        )
        feed = os.path.join(work, "feed")
        for batch_id in (0, 1):
            batch = ev.filter(F.col("lsn") % 2 == batch_id)
            src.merge(lww_latest(batch), batch_id=batch_id)
            assert publish_changes(src, batch_id, feed)["published"]
        dst = ManifestParquetTable.create(
            spark, os.path.join(work, "dst"), schema, n_buckets=8
        )
        apply_published(dst, feed)
        rows = dst.read().select("doc_id", "lsn", "price").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_stats_minmax(spark, sf):
    """Metadata-only aggregate (lake.min_max): a clean CoW table answers
    exact min/max from manifest zone maps with ZERO data-reading jobs.
    The returned metadata_only flag is part of the compared result, so
    the oracle hash FAILS if the engine silently fell back to a scan —
    the fast path itself is under test, not just the values."""
    work = tempfile.mkdtemp(prefix="rap-etl-stats-minmax-")
    try:
        table, schema = _dml_table(spark, work, sf, "cow")
        vals, meta_only = table.min_max(["bal"])
        return spark.createDataFrame(
            [(float(vals["bal"][0]), float(vals["bal"][1]), bool(meta_only))],
            "min_bal double, max_bal double, metadata_only boolean",
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_fast_count_meta(spark, sf):
    """lake.fast_count through BOTH of its regimes in one result: on the
    all-live snapshot it answers from manifest metadata alone (zero
    jobs), and after a tombstone-bearing MoR delta lands it must fall
    back to a bucket-pruned resolved scan for exactly the touched
    buckets — still exact. A wrong ledger count, a double-counted
    superseded row, or a miscounted DV would break either column."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("bal", T.DoubleType()),
        ]
    )
    c = _t(spark, sf, "customer")
    base = c.select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("bal"),
        F.lit(1).alias("lsn"),
    )
    dels = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("bal"),
        F.lit(2).alias("lsn"),
        F.lit("D").alias("op"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-fast-count-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8,
            merge_mode="mor",
        )
        table.merge(base, batch_id=0)
        clean = table.fast_count()
        table.merge(dels, batch_id=1)
        mixed = table.fast_count()
        return spark.createDataFrame(
            [(int(clean), int(mixed))], "clean_count long, mixed_count long"
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_lookup_bloom(spark, sf):
    """Bloom-indexed point lookup: a MoR stack (base + update deltas
    whose key ranges span every bucket — the zone-map-blind layout) gets
    per-file key bloom sidecars (lake.build_key_blooms), then lookup()
    must return exactly the LWW winners for a fixed key set. Bloom false
    negatives would LOSE rows here; stale/over-broad blooms would only
    cost extra reads, never wrong answers."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("bal", T.DoubleType()),
        ]
    )
    base = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("bal"),
        F.lit(1).alias("lsn"),
    )
    upd = _t(spark, sf, "customer").filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        (F.col("c_acctbal") + 1000.0).alias("bal"),
        F.lit(2).alias("lsn"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-lookup-bloom-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8,
            merge_mode="mor",
        )
        table.merge(base, batch_id=0)
        table.merge(upd, batch_id=1)
        table.build_key_blooms()
        keys = [str(k) for k in range(1, 41)]
        rows = table.lookup(keys).select("doc_id", "bal").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2 = {
    "stats_minmax": q_stats_minmax,
    "lookup_bloom": q_lookup_bloom,
    "fast_count_meta": q_fast_count_meta,
    "publish_roundtrip": q_publish_roundtrip,
    "read_range_prune": q_read_range,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q22_idle_customers": q22_idle_customers,
    "cdc_merge": q_cdc_merge,
    "cdc_merge_mor": q_cdc_merge_mor,
    "dml_delete_where": q_dml_delete_where,
    "dml_update_where": q_dml_update_where,
    "dml_delete_dv": q_dml_delete_dv,
}

TPCH_ORACLES2 = {
    "stats_minmax": (
        "SELECT min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,"
        " CAST(1 AS BOOLEAN) AS metadata_only FROM customer"
    ),
    "fast_count_meta": (
        "SELECT (SELECT count(*) FROM customer) AS clean_count,"
        " (SELECT count(*) FROM customer WHERE c_custkey % 5 <> 0)"
        " AS mixed_count"
    ),
    "lookup_bloom": (
        "SELECT CAST(c_custkey AS VARCHAR) AS doc_id,"
        " CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000.0"
        " ELSE c_acctbal END AS bal FROM customer"
        " WHERE c_custkey BETWEEN 1 AND 40"
    ),
    "publish_roundtrip": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_totalprice AS price,"
        " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
        " FROM orders),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
    ),
    "read_range_prune": (
        "SELECT CAST(c_custkey AS VARCHAR) AS doc_id, c_acctbal AS bal,"
        " c_mktsegment AS seg FROM customer"
        " WHERE c_acctbal >= 1000.0 AND c_acctbal <= 3000.0"
    ),
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
    "cdc_merge_mor": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_totalprice AS price,"
        " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
        " FROM orders),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
    ),
    "dml_delete_where": (
        "SELECT CAST(c_custkey AS VARCHAR) AS doc_id, c_acctbal AS bal,"
        " c_mktsegment AS seg FROM customer WHERE NOT (c_acctbal < 0.0)"
    ),
    "dml_update_where": (
        "SELECT CAST(c_custkey AS VARCHAR) AS doc_id,"
        " CASE WHEN c_acctbal < 0.0 THEN 0.0 ELSE c_acctbal END AS bal,"
        " CASE WHEN c_acctbal < 0.0 THEN 'SCRUBBED' ELSE c_mktsegment END AS seg"
        " FROM customer"
    ),
    "dml_delete_dv": (
        "WITH st AS (SELECT CAST(c_custkey AS VARCHAR) AS doc_id,"
        " CASE WHEN c_mktsegment = 'AUTOMOBILE'"
        "   THEN c_acctbal + 1000.0 ELSE c_acctbal END AS bal,"
        " c_mktsegment AS seg FROM customer)"
        " SELECT doc_id, bal, seg FROM st"
        " WHERE NOT (bal < 0.0) AND seg <> 'MACHINERY'"
    ),
}


# --------------------------------------------------------------------------
# wave 7 (round 2): cross join, statistical aggs, rank-family windows,
# multiset ops, argmin/argmax + boolean aggs, bitwise functions
# --------------------------------------------------------------------------
def q_join_cross(spark, sf):
    """J9 cross join (explicit cartesian, tiny dims only — at scale an
    unintended cross join is a bug, so the operator exists but broadcast
    keeps it sane)."""
    r1 = _t(spark, sf, "region").select(F.col("r_name").alias("a"))
    r2 = _t(spark, sf, "region").select(F.col("r_name").alias("b"))
    return r1.crossJoin(F.broadcast(r2)).filter(F.col("a") < F.col("b"))


def q_agg_stats(spark, sf):
    """A7 statistical aggregates: stddev/variance/corr/covariance per
    group (rounded: both engines sum FP in different orders)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("cov_qd"),
    )


def q_win_dense_cume(spark, sf):
    """W1+ rank family: dense_rank + cume_dist per customer order value."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_set_intersect_all(spark, sf):
    """U2+ INTERSECT ALL (multiset semantics — duplicates preserved)."""
    a = _t(spark, sf, "lineitem").select("l_quantity")
    b = _t(spark, sf, "lineitem").filter(F.col("l_discount") > 0.03).select(
        "l_quantity"
    )
    return a.intersectAll(b)


def q_set_except_all(spark, sf):
    """U3+ EXCEPT ALL (multiset difference)."""
    a = _t(spark, sf, "lineitem").select("l_quantity")
    b = _t(spark, sf, "lineitem").filter(F.col("l_discount") > 0.03).select(
        "l_quantity"
    )
    return a.exceptAll(b)


def q_agg_argminmax(spark, sf):
    """A8 argmin/argmax + boolean aggregates: per segment, the name of the
    customer with the highest/lowest balance, and balance-sign tests.
    The ordering value is exact cents with the unique custkey as a tie
    break, so argmin/argmax is deterministic across engines."""
    c = _t(spark, sf, "customer")
    val = (
        F.round(F.col("c_acctbal") * 100).cast("long") * 100000
        + F.col("c_custkey")
    )
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", val).alias("richest"),
        F.min_by("c_name", val).alias("poorest"),
        F.bool_and(F.col("c_acctbal") > -1000.0).alias("all_above"),
        F.bool_or(F.col("c_acctbal") < 0.0).alias("any_negative"),
    )


def q_fn_bitwise(spark, sf):
    """F9 bitwise functions: and/or/xor/shift/count over integer keys."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderkey").bitwiseAND(F.lit(255))).alias("low8"),
        (F.col("o_orderkey").bitwiseOR(F.lit(1))).alias("odd1"),
        (F.col("o_orderkey").bitwiseXOR(F.col("o_custkey"))).alias("x"),
        F.shiftleft("o_orderkey", 2).alias("shl2"),
        F.bit_count("o_orderkey").alias("popcnt"),
    )


TPCH_QUERIES2.update(
    {
        "join_cross": q_join_cross,
        "agg_stats": q_agg_stats,
        "win_dense_cume": q_win_dense_cume,
        "set_intersect_all": q_set_intersect_all,
        "set_except_all": q_set_except_all,
        "agg_argminmax": q_agg_argminmax,
        "fn_bitwise": q_fn_bitwise,
    }
)

TPCH_ORACLES2.update(
    {
        "join_cross": (
            "SELECT r1.r_name AS a, r2.r_name AS b"
            " FROM region r1 CROSS JOIN region r2 WHERE r1.r_name < r2.r_name"
        ),
        "agg_stats": (
            "SELECT l_returnflag,"
            " round(stddev_samp(l_quantity), 4) AS sd_qty,"
            " round(var_pop(l_quantity), 4) AS var_qty,"
            " round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,"
            " round(covar_samp(l_quantity, l_discount), 4) AS cov_qd"
            " FROM lineitem GROUP BY l_returnflag"
        ),
        "win_dense_cume": (
            "SELECT o_orderkey, o_custkey,"
            " dense_rank() OVER w AS drnk,"
            " round(cume_dist() OVER w, 6) AS cume"
            " FROM orders"
            " WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)"
        ),
        "set_intersect_all": (
            "SELECT l_quantity FROM lineitem"
            " INTERSECT ALL"
            " SELECT l_quantity FROM lineitem WHERE l_discount > 0.03"
        ),
        "set_except_all": (
            "SELECT l_quantity FROM lineitem"
            " EXCEPT ALL"
            " SELECT l_quantity FROM lineitem WHERE l_discount > 0.03"
        ),
        "agg_argminmax": (
            "SELECT c_mktsegment,"
            " max_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000"
            "   + c_custkey) AS richest,"
            " min_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 100000"
            "   + c_custkey) AS poorest,"
            " bool_and(c_acctbal > -1000.0) AS all_above,"
            " bool_or(c_acctbal < 0.0) AS any_negative"
            " FROM customer GROUP BY c_mktsegment"
        ),
        "fn_bitwise": (
            "SELECT o_orderkey,"
            " o_orderkey & 255 AS low8,"
            " o_orderkey | 1 AS odd1,"
            " xor(o_orderkey, o_custkey) AS x,"
            " o_orderkey << 2 AS shl2,"
            " bit_count(o_orderkey) AS popcnt"
            " FROM orders"
        ),
    }
)


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


def q_incr_agg_maintain(spark, sf):
    """Incremental view maintenance end-to-end, oracled: maintain a
    per-group (count, sum) aggregate of the lake table across a merge
    batch by folding table_changes deltas into the batch-0 aggregate —
    never re-scanning the table (operators/incremental.py). Money is
    carried in exact integer cents so ⊕ is associative and the maintained
    sum is bit-equal to the recomputed one. Oracle: aggregate of the
    final LWW state."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.operators.incremental import maintain

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price_c", T.LongType()),
        ]
    )
    grp = (F.col("doc_id").cast("int") % 10).alias("grp")
    out_schema = T.StructType(
        [
            T.StructField("grp", T.IntegerType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("sum_cents", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-ivm-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        sid1 = table.snapshot_id()
        base = (
            table.read()
            .groupBy(grp)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("price_c").alias("price_c"),
            )
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        changes = table.table_changes(sid1).select(grp, "_change_type", "price_c")
        maintained = maintain(
            base, changes, ["grp"], ["price_c"], count_col="n_docs"
        ).select("grp", "n_docs", F.col("price_c").alias("sum_cents"))
        rows = maintained.collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_incr_join_maintain(spark, sf):
    """Join-view IVM end-to-end, oracled: maintain a fact⋈dim view (lake
    events ⋈ customer segments) across a merge batch by replacing only the
    changed keys' view rows (operators/incremental.py maintain_join_view)
    — the fact table is never re-scanned after the initial view build.
    Oracle: the final LWW state joined to customer."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.operators.incremental import maintain_join_view

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
        list(schema.fields) + [T.StructField("seg", T.StringType())]
    )
    dim = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("c_key"),
        F.col("c_mktsegment").alias("seg"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-ivm-join-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        sid1 = table.snapshot_id()
        view = table.read().join(
            F.broadcast(dim), F.col("doc_id") == F.col("c_key"), "inner"
        ).select("doc_id", "lsn", "price", "seg")
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        changes = table.table_changes(sid1)
        maintained = maintain_join_view(
            view,
            changes,
            F.broadcast(dim),
            key="doc_id",
            on=F.col("doc_id") == F.col("c_key"),
        )
        rows = maintained.collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["cdc_table_changes"] = q_cdc_table_changes
TPCH_QUERIES2["incr_agg_maintain"] = q_incr_agg_maintain
TPCH_QUERIES2["incr_join_maintain"] = q_incr_join_maintain

TPCH_ORACLES2["incr_join_maintain"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, o_totalprice AS price,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT doc_id, lsn, price, c_mktsegment AS seg FROM live"
    " JOIN customer ON CAST(doc_id AS BIGINT) = c_custkey"
)

TPCH_ORACLES2["incr_agg_maintain"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT CAST(doc_id AS INT) % 10 AS grp, count(*) AS n_docs,"
    " CAST(sum(price_c) AS BIGINT) AS sum_cents FROM live GROUP BY grp"
)

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


# --------------------------------------------------------------------------
# wave 6 (round 2): pivot/unpivot, regexp, higher-order lambdas, exact
# percentiles, RANGE window frames
# --------------------------------------------------------------------------
def q_agg_pivot(spark, sf):
    """A4+ pivot: linestatus columns per returnflag. Pivot values are
    pinned so the output schema is static (a scan-independent plan — at
    scale an unpinned pivot needs an extra distinct pass)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_f"),
            F.col("O").alias("qty_o"),
        )
    )


def q_unpivot_melt(spark, sf):
    """Unpivot/melt: wide part metrics to long (p_partkey, metric, value)."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retail"),
    ).unpivot("p_partkey", ["size", "retail"], "metric", "value")


def q_fn_regexp(spark, sf):
    """F1+ regexp functions: extract, global replace, match test. Patterns
    stay in the Java∩RE2 common subset so engines agree."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([A-Za-z]{4,})", 1).alias("first_long_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devowel"),
        F.col("text").rlike("ing").cast("int").alias("has_ing"),
    )


def q_fn_higher_order(spark, sf):
    """F6+ higher-order lambdas over array columns: transform / filter /
    aggregate fold — all JVM codegen, the Spark-native way to compute on
    embeddings without a UDF. Elements are cast float→double BEFORE the
    fold on both engines so the left-to-right summation is bit-identical."""
    e = _t(spark, sf, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vsum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.element_at(as_double, 1) * 2.0, 5).alias("first2x"),
    )


def q_agg_percentile(spark, sf):
    """A1+ exact percentiles (linear interpolation) per group."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("q25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("q75"),
    )


def q_win_range_frame(spark, sf):
    """W3+ RANGE frame (value-based, not row-based): per customer, the sum
    of order totals within 1000.0 below each order's total. (SQL form:
    pyspark's Window.rangeBetween only accepts integer offsets, but a
    RANGE frame over a DOUBLE ordering needs a fractional offset.)"""
    _t(spark, sf, "orders").createOrReplaceTempView("v_orders_rf")
    return spark.sql(
        "SELECT o_orderkey, o_custkey,"
        " round(sum(o_totalprice) OVER (PARTITION BY o_custkey"
        "   ORDER BY o_totalprice"
        "   RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS near_sum"
        " FROM v_orders_rf"
    )


TPCH_QUERIES2.update(
    {
        "agg_pivot": q_agg_pivot,
        "unpivot_melt": q_unpivot_melt,
        "fn_regexp": q_fn_regexp,
        "fn_higher_order": q_fn_higher_order,
        "agg_percentile": q_agg_percentile,
        "win_range_frame": q_win_range_frame,
    }
)

TPCH_ORACLES2.update(
    {
        "agg_pivot": (
            "SELECT l_returnflag,"
            " round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2)"
            " AS qty_f,"
            " round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2)"
            " AS qty_o"
            " FROM lineitem GROUP BY l_returnflag"
        ),
        "unpivot_melt": (
            "SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value"
            " FROM part"
            " UNION ALL"
            " SELECT p_partkey, 'retail' AS metric, p_retailprice AS value"
            " FROM part"
        ),
        "fn_regexp": (
            "SELECT doc_id,"
            " regexp_extract(text, '([A-Za-z]{4,})', 1) AS first_long_word,"
            " regexp_replace(text, '[aeiou]', '_', 'g') AS devowel,"
            " CAST(regexp_matches(text, 'ing') AS INT) AS has_ing"
            " FROM documents"
        ),
        "fn_higher_order": (
            "SELECT vec_id,"
            " round(list_sum(list_transform(embedding,"
            "   x -> CAST(x AS DOUBLE))), 4) AS vsum,"
            " CAST(length(list_filter(embedding, x -> x > 0)) AS BIGINT)"
            " AS n_pos,"
            " round(CAST(embedding[1] AS DOUBLE) * 2.0, 5) AS first2x"
            " FROM embeddings"
        ),
        "agg_percentile": (
            "SELECT l_returnflag,"
            " round(quantile_cont(l_quantity, 0.25), 6) AS q25,"
            " round(quantile_cont(l_quantity, 0.5), 6) AS median,"
            " round(quantile_cont(l_quantity, 0.75), 6) AS q75"
            " FROM lineitem GROUP BY l_returnflag"
        ),
        "win_range_frame": (
            "SELECT o_orderkey, o_custkey,"
            " round(sum(o_totalprice) OVER (PARTITION BY o_custkey"
            "   ORDER BY o_totalprice"
            "   RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS near_sum"
            " FROM orders"
        ),
    }
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


# --------------------------------------------------------------------------
# custom binlog source (round 2): binary segment format round-trip, oracled
# --------------------------------------------------------------------------
def q_binlog_roundtrip(spark, sf):
    """S-source: the custom .rapwal binary segment format driven through its
    Spark Python DataSource (sources/binlog.py) and oracled BY VALUE —
    derive change events deterministically from `events`, write them as
    lsn-range segments from executors, read them back with
    spark.read.format("rap-etl-binlog"), return every row. The oracle is
    the same derivation in plain SQL: any framing/offset/encoding bug in
    the wire format breaks the value hash. Deletes carry empty (not null)
    token lists on the wire — the derivation builds them that way. The
    tokens column is serialized to a CSV string in the output (and via
    array_to_string in the oracle): identical value coverage, but the
    driver's canonicalizer cannot hash bare array<> cells (round-2
    CORRECTNESS ERR "unhashable type: 'list'")."""
    from rap_etl_spark.sources.binlog import register, write_binlog_segments

    ev = _t(spark, sf, "events").select(
        F.when(F.col("event_id") % 10 == 0, "D")
        .when(F.col("event_id") % 10 == 1, "I")
        .otherwise("U")
        .alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        F.col("event_id").alias("lsn"),
        F.when(
            F.col("event_id") % 10 == 0,
            F.array().cast("array<int>"),
        )
        .otherwise(
            F.sequence(F.lit(1), (F.col("event_id") % 7 + 1).cast("int"))
        )
        .alias("tokens"),
        F.col("event_type").alias("source"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-binlog-")
    try:
        register(spark)
        write_binlog_segments(ev, os.path.join(work, "wal"), n_segments=4)
        got = (
            spark.read.format("rap-etl-binlog")
            .option("path", os.path.join(work, "wal"))
            .load()
        )
        # materialize before the tempdir disappears (same as cdc_merge)
        rows = got.collect()
        return spark.createDataFrame(rows, got.schema).select(
            "op",
            "doc_id",
            "lsn",
            F.concat_ws(",", "tokens").alias("tokens"),
            "source",
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["binlog_roundtrip"] = q_binlog_roundtrip
TPCH_ORACLES2["binlog_roundtrip"] = (
    "SELECT CASE WHEN event_id % 10 = 0 THEN 'D'"
    " WHEN event_id % 10 = 1 THEN 'I' ELSE 'U' END AS op,"
    " 'u' || CAST(user_id AS VARCHAR) AS doc_id,"
    " event_id AS lsn,"
    " CASE WHEN event_id % 10 = 0 THEN ''"
    " ELSE array_to_string("
    "   range(1, CAST(event_id % 7 AS INTEGER) + 2), ',')"
    " END AS tokens,"
    " event_type AS source"
    " FROM events"
)


def q_topic_roundtrip(spark, sf):
    """S-source (X85): the PARTITIONED WAL topic — the same deterministic
    change-event derivation as binlog_roundtrip, produced into a
    4-partition topic in one job (stable xxhash key routing, per-partition
    ordered atomic publish) and read back with
    spark.read.format("rap-etl-topic"). The oracle is the derivation in
    plain SQL: any routing loss/duplication or per-partition framing bug
    breaks the value hash. Tokens serialize to CSV (driver canonicalizer
    cannot hash bare arrays)."""
    from rap_etl_spark.sources.topic import register, write_topic

    ev = _t(spark, sf, "events").select(
        F.when(F.col("event_id") % 10 == 0, "D")
        .when(F.col("event_id") % 10 == 1, "I")
        .otherwise("U")
        .alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        F.col("event_id").alias("lsn"),
        F.when(
            F.col("event_id") % 10 == 0,
            F.array().cast("array<int>"),
        )
        .otherwise(
            F.sequence(F.lit(1), (F.col("event_id") % 7 + 1).cast("int"))
        )
        .alias("tokens"),
        F.col("event_type").alias("source"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-topic-")
    try:
        register(spark)
        write_topic(ev, os.path.join(work, "topic"), n_partitions=4)
        got = (
            spark.read.format("rap-etl-topic")
            .option("path", os.path.join(work, "topic"))
            .load()
        )
        rows = got.collect()
        return spark.createDataFrame(rows, got.schema).select(
            "op",
            "doc_id",
            "lsn",
            F.concat_ws(",", "tokens").alias("tokens"),
            "source",
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["topic_roundtrip"] = q_topic_roundtrip
TPCH_ORACLES2["topic_roundtrip"] = TPCH_ORACLES2["binlog_roundtrip"]


# --------------------------------------------------------------------------
# round 3: non-distributive IVM — MIN/MAX maintenance with dirty-group
# re-aggregation (operators/incremental.py maintain_minmax)
# --------------------------------------------------------------------------
def q_incr_minmax_maintain(spark, sf):
    """MIN/MAX IVM end-to-end, oracled: maintain per-group
    (count, min, max) of the lake table across a merge batch. Inserts
    fold in closed form; groups where a delete removed the stored
    extremum re-aggregate from the post-merge table via ONE broadcast
    semi-joined pass over exactly those groups (deletes on every 10th
    orderkey guarantee both clean and dirty groups exist). Oracle:
    min/max/count of the final LWW state."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.operators.incremental import maintain_minmax

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price_c", T.LongType()),
        ]
    )
    grp = (F.col("doc_id").cast("int") % 10).alias("grp")
    out_schema = T.StructType(
        [
            T.StructField("grp", T.IntegerType()),
            T.StructField("n_docs", T.LongType()),
            T.StructField("min_v", T.LongType()),
            T.StructField("max_v", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-ivm-minmax-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        sid1 = table.snapshot_id()
        base = (
            table.read()
            .groupBy(grp)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("price_c").alias("min_v"),
                F.max("price_c").alias("max_v"),
            )
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        changes = table.table_changes(sid1).select(grp, "_change_type", "price_c")
        maintained = maintain_minmax(
            base,
            changes,
            table.read().select(grp, "price_c"),
            ["grp"],
            "price_c",
            count_col="n_docs",
        )
        rows = maintained.select("grp", "n_docs", "min_v", "max_v").collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["incr_minmax_maintain"] = q_incr_minmax_maintain

TPCH_ORACLES2["incr_minmax_maintain"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT CAST(doc_id AS INT) % 10 AS grp, count(*) AS n_docs,"
    " min(price_c) AS min_v, max(price_c) AS max_v FROM live GROUP BY grp"
)


def q_incr_topk_maintain(spark, sf):
    """TOP-K IVM end-to-end, oracled: maintain per-group top-3 rows (by
    price desc, doc_id tiebreak) of the lake table across a merge batch.
    Inserts fold in closed form (rank state ∪ batch); groups where a
    delete removed a stored top-3 row re-rank from the post-merge table
    via ONE broadcast-semi pass over exactly those groups (deletes on
    every 10th orderkey guarantee both clean and dirty groups exist).
    Oracle: top-3 per group of the final LWW live state."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.operators.incremental import maintain_topk

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price_c", T.LongType()),
        ]
    )
    grp = (F.col("doc_id").cast("int") % 10).alias("grp")
    out_schema = T.StructType(
        [
            T.StructField("grp", T.IntegerType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("price_c", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-ivm-topk-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        sid1 = table.snapshot_id()
        w = Window.partitionBy("grp").orderBy(
            F.col("price_c").desc(), F.col("doc_id").asc()
        )
        state = (
            table.read()
            .select(grp, "doc_id", "price_c")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 3)
            .drop("_rn")
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        changes = table.table_changes(sid1).select(
            grp, "_change_type", "doc_id", "price_c"
        )
        maintained = maintain_topk(
            state,
            changes,
            table.read().select(grp, "doc_id", "price_c"),
            ["grp"],
            "price_c",
            "doc_id",
            k=3,
        )
        rows = maintained.select("grp", "doc_id", "price_c").collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["incr_topk_maintain"] = q_incr_topk_maintain

TPCH_ORACLES2["incr_topk_maintain"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT CAST(doc_id AS INT) % 10 AS grp, doc_id, price_c"
    "   FROM w WHERE rn = 1 AND op <> 'D'),"
    " r AS (SELECT *, row_number() OVER"
    "   (PARTITION BY grp ORDER BY price_c DESC, doc_id ASC) AS rk FROM live)"
    " SELECT grp, doc_id, price_c FROM r WHERE rk <= 3"
)


def q_table_restore(spark, sf):
    """Snapshot rollback/RESTORE end-to-end, oracled: bootstrap the table
    from `customer`, apply an update batch (prices from even orderkeys),
    capture the snapshot, apply a SECOND batch (odd orderkeys), then
    ``rollback`` to the captured snapshot — a new commit whose state must
    equal the post-batch-1 state exactly. The oracle states that state:
    customer LEFT JOIN the even-orderkey LWW fold. Rollback is a commit,
    not history erasure (the ledger keeps both batch ids), so the read
    exercises the normal snapshot-resolution path."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_totalprice").alias("price"),
        F.lit("U").alias("op"),
    )
    boot = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.lit(0).cast("long").alias("lsn"),
        F.col("c_acctbal").alias("price"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-restore-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.append(boot, batch_id=0, assume_unique=True)
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=1)
        keep = table.snapshot_id()
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=2)
        table.rollback(keep)
        rows = table.read().select("doc_id", "lsn", "price").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["table_restore"] = q_table_restore

TPCH_ORACLES2["table_restore"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, o_totalprice AS price FROM orders"
    " WHERE o_orderkey % 2 = 0),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
    " SELECT CAST(c_custkey AS VARCHAR) AS doc_id,"
    "  coalesce(w.lsn, 0) AS lsn,"
    "  coalesce(w.price, c_acctbal) AS price"
    " FROM customer c LEFT JOIN (SELECT * FROM w WHERE rn = 1) w"
    "  ON w.doc_id = CAST(c_custkey AS VARCHAR)"
)


def q_incr_count_distinct(spark, sf):
    """Exact COUNT(DISTINCT) IVM end-to-end, oracled: maintain per-group
    distinct priority counts of the lake table across a merge batch via
    the refcount state (HLL can't subtract; the refcount fold can).
    Bootstrap the state from the post-batch-0 table, merge batch 1 (with
    deletes on every 10th orderkey), fold `table_changes` into the state,
    and report per-group n_distinct. Oracle: COUNT(DISTINCT) of the final
    LWW live state."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.operators.incremental import maintain_count_distinct

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_orderpriority").alias("prio"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("prio", T.StringType()),
        ]
    )
    grp = (F.col("doc_id").cast("int") % 10).alias("grp")
    out_schema = T.StructType(
        [
            T.StructField("grp", T.IntegerType()),
            T.StructField("n_distinct", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-ivm-cd-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        sid1 = table.snapshot_id()
        state = (
            table.read()
            .groupBy(grp, "prio")
            .agg(F.count(F.lit(1)).alias("_refcount"))
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        changes = table.table_changes(sid1).select(grp, "_change_type", "prio")
        _, counts = maintain_count_distinct(state, changes, ["grp"], "prio")
        rows = counts.select("grp", "n_distinct").collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["incr_count_distinct"] = q_incr_count_distinct

TPCH_ORACLES2["incr_count_distinct"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, o_orderpriority AS prio,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT CAST(doc_id AS INT) % 10 AS grp,"
    " count(DISTINCT prio) AS n_distinct FROM live GROUP BY grp"
)


def q_incr_token_stats(spark, sf):
    """Token-frequency IVM end-to-end, oracled — the tokens-payload
    special case: maintain the corpus token-frequency table of a CDC'd
    tokenized corpus WITHOUT re-exploding the corpus. Each doc carries a
    deterministic 3-token array; batch 1's updates/deletes fold into the
    bootstrapped stats as signed exploded deltas (an update contributes
    preimage at -1 and postimage at +1). Oracle: re-explode the final LWW
    live state and count."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.operators.incremental import maintain_token_stats

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.array(
            (F.col("o_orderkey") % 97).cast("int"),
            (F.col("o_custkey") % 97).cast("int"),
            ((F.col("o_orderkey") + F.col("o_custkey")) % 97).cast("int"),
        ).alias("tokens"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("token", T.IntegerType()),
            T.StructField("freq", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-ivm-tok-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        sid1 = table.snapshot_id()
        stats = (
            table.read()
            .select(F.explode("tokens").alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        changes = table.table_changes(sid1).select("_change_type", "tokens")
        maintained = maintain_token_stats(stats, changes)
        rows = maintained.select("token", "freq").collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_incr_posting_maintain(spark, sf):
    """Inverted-index IVM end-to-end, oracled: maintain each token's
    TOP-K POSTING LIST (largest doc keys containing it) across a CDC
    batch WITHOUT re-exploding the corpus — the search-index-freshness
    problem at 10^10 docs. Composition of existing machinery: the commit's
    changefeed is exploded to (token, doc) pairs, netted to a true SET
    diff (a token present in both pre- and postimage is no change), and
    folded by maintain_topk — inserts in closed form, deletes re-rank only
    tokens whose stored k-th posting is threatened, via one broadcast-semi
    pass over exactly those tokens' fact rows. Oracle: recompute the
    postings from the final LWW live corpus."""
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.operators.incremental import maintain_topk

    K = 5
    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.array(
            (F.col("o_orderkey") % 97).cast("int"),
            (F.col("o_custkey") % 97).cast("int"),
            ((F.col("o_orderkey") + F.col("o_custkey")) % 97).cast("int"),
        ).alias("tokens"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("token", T.IntegerType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )

    def postings(df):
        """Distinct (token, doc) pairs with the numeric ranking value."""
        return df.select(
            F.explode(F.array_distinct("tokens")).alias("token"),
            "doc_id",
            F.col("doc_id").cast("long").alias("val"),
        )

    work = tempfile.mkdtemp(prefix="rap-etl-ivm-post-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        sid1 = table.snapshot_id()
        w = Window.partitionBy("token").orderBy(
            F.col("val").desc(), F.col("doc_id").asc()
        )
        state = (
            postings(table.read())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= K)
            .drop("_rn")
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1)
        ch = table.table_changes(sid1)
        pre = postings(
            ch.filter(F.col("_change_type").isin("delete", "update_preimage"))
        )
        post = postings(
            ch.filter(F.col("_change_type").isin("insert", "update_postimage"))
        )
        # net set diff: unchanged (token, doc) pairs cancel, so the fold
        # never sees a removal (or a duplicate insert) that isn't real
        signed = pre.subtract(post).withColumn(
            "_change_type", F.lit("delete")
        ).unionByName(
            post.subtract(pre).withColumn("_change_type", F.lit("insert"))
        )
        maintained = maintain_topk(
            state,
            signed,
            postings(table.read()),
            group_cols=["token"],
            val_col="val",
            key_col="doc_id",
            k=K,
        )
        rows = maintained.select("token", "doc_id", "val").collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["incr_posting_maintain"] = q_incr_posting_maintain

TPCH_ORACLES2["incr_posting_maintain"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn,"
    " [CAST(o_orderkey % 97 AS INT), CAST(o_custkey % 97 AS INT),"
    "  CAST((o_orderkey + o_custkey) % 97 AS INT)] AS tokens,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D'),"
    " ex AS (SELECT DISTINCT token, doc_id FROM"
    "   (SELECT unnest(list_distinct(tokens)) AS token, doc_id FROM live)),"
    " r AS (SELECT token, doc_id, CAST(doc_id AS BIGINT) AS val,"
    "   row_number() OVER (PARTITION BY token"
    "     ORDER BY CAST(doc_id AS BIGINT) DESC, doc_id ASC) AS prn FROM ex)"
    " SELECT token, doc_id, val FROM r WHERE prn <= 5"
)


TPCH_QUERIES2["incr_token_stats"] = q_incr_token_stats

TPCH_ORACLES2["incr_token_stats"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn,"
    " [CAST(o_orderkey % 97 AS INT), CAST(o_custkey % 97 AS INT),"
    "  CAST((o_orderkey + o_custkey) % 97 AS INT)] AS tokens,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "   (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D'),"
    " ex AS (SELECT unnest(tokens) AS token FROM live)"
    " SELECT token, count(*) AS freq FROM ex GROUP BY token"
)


def q_topic_compacted(spark, sf):
    """X91: Kafka-style log compaction on the partitioned WAL topic. The
    topic_roundtrip derivation is produced in TWO producer calls (two
    segments per partition, so the compactor has a real prefix to fold),
    compacted in place (latest record per key survives, tombstones kept,
    segment count/offsets preserved), and read back whole. The oracle is
    the plain LWW window SQL over the derivation: any winner lost, any
    superseded record surviving, or any cross-partition routing error
    breaks the value hash."""
    from rap_etl_spark.sources.topic import compact_topic, register, write_topic

    ev = _t(spark, sf, "events").select(
        F.when(F.col("event_id") % 10 == 0, "D")
        .when(F.col("event_id") % 10 == 1, "I")
        .otherwise("U")
        .alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("doc_id"),
        F.col("event_id").alias("lsn"),
        F.when(
            F.col("event_id") % 10 == 0,
            F.array().cast("array<int>"),
        )
        .otherwise(
            F.sequence(F.lit(1), (F.col("event_id") % 7 + 1).cast("int"))
        )
        .alias("tokens"),
        F.col("event_type").alias("source"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-topic-compact-")
    try:
        register(spark)
        topic = os.path.join(work, "topic")
        # two produce calls -> two segments per partition
        write_topic(ev.filter(F.col("lsn") % 2 == 0), topic, n_partitions=4)
        write_topic(ev.filter(F.col("lsn") % 2 == 1), topic, n_partitions=4)
        stats = compact_topic(spark, topic)
        assert all(s["segments"] == 2 for s in stats.values())
        got = (
            spark.read.format("rap-etl-topic")
            .option("path", topic)
            .load()
        )
        rows = got.collect()
        return spark.createDataFrame(rows, got.schema).select(
            "op",
            "doc_id",
            "lsn",
            F.concat_ws(",", "tokens").alias("tokens"),
            "source",
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


TPCH_QUERIES2["topic_compacted"] = q_topic_compacted
TPCH_ORACLES2["topic_compacted"] = (
    "WITH ev AS (SELECT CASE WHEN event_id % 10 = 0 THEN 'D'"
    " WHEN event_id % 10 = 1 THEN 'I' ELSE 'U' END AS op,"
    " 'u' || CAST(user_id AS VARCHAR) AS doc_id,"
    " event_id AS lsn,"
    " CASE WHEN event_id % 10 = 0 THEN ''"
    " ELSE array_to_string("
    "   range(1, CAST(event_id % 7 AS INTEGER) + 2), ',')"
    " END AS tokens,"
    " event_type AS source FROM events),"
    " w AS (SELECT *, row_number() OVER"
    " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
    " SELECT op, doc_id, lsn, tokens, source FROM w WHERE rn = 1"
)
