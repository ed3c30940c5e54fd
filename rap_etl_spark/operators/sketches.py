"""Mergeable-sketch aggregations (Apache DataSketches, JVM-side).

At 100 TB, exact distinct/set-algebra/quantile queries each cost a full
shuffle of the key domain; sketches replace that with a MERGEABLE fixed-
size state: map-side partial sketch per partition, a shuffle of kilobytes,
one merge. These operators exercise the full two-level pattern (sketch →
store per group → union/intersect across groups), which is also the
incremental-maintenance form: per-batch sketches persisted next to the
aggregate and folded in per micro-batch without re-reading history
(compare operators/incremental.py for the exact-distributive case).

Oracle note: the HLL and theta entries are value-oracled against EXACT SQL
because at driver scale (sf0.01) every cardinality involved sits inside
the sketches' exact regime (HLL sparse mode below ~2^lgK entries; theta
in exact mode below its nominal 4096 entries) — measured: suppliers 100,
priority-pair customer union 1468. KLL quantiles carry no such exactness
guarantee, so they are rows-only with a pytest epsilon gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rap_etl_spark.operators.relational import _t


def q_sketch_hll_union(spark, sf):
    """Two-level HLL distinct count: per-returnflag sketches of the
    supplier set, plus the cross-group union-merge (label 'ALL') — the
    merged estimate must equal the direct global distinct."""
    li = _t(spark, sf, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_suppkey").alias("sk")
    )
    per_est = per.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("n_suppliers"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_suppliers")
    ).select(F.lit("ALL").alias("l_returnflag"), "n_suppliers")
    return per_est.unionByName(merged)


def q_sketch_theta_setops(spark, sf):
    """Theta-sketch set algebra: customers who placed URGENT orders vs LOW
    orders — intersection and union cardinalities from per-priority
    sketches (never materializing either key set past the sketch)."""
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    per = o.groupBy("o_orderpriority").agg(
        F.theta_sketch_agg("o_custkey").alias("sk")
    )
    return per.agg(
        F.theta_sketch_estimate(F.theta_intersection_agg("sk")).alias(
            "n_both"
        ),
        F.theta_sketch_estimate(F.theta_union_agg("sk")).alias("n_either"),
    )


def q_sketch_kll_quantiles(spark, sf):
    """Rows-only: KLL quantile sketch of l_quantity per returnflag — the
    mergeable alternative to exact percentiles (agg_percentile); rank
    accuracy is pytest-gated (tests/test_sketches.py), not oracled."""
    li = _t(spark, sf, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_quantity").alias("sk")
    )
    return sk.select(
        "l_returnflag",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.25)).alias("q25"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("median"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.75)).alias("q75"),
    )


SKETCH_QUERIES = {
    "sketch_hll_union": q_sketch_hll_union,
    "sketch_theta_setops": q_sketch_theta_setops,
    "sketch_kll_quantiles": q_sketch_kll_quantiles,
}

SKETCH_ORACLES = {
    "sketch_hll_union": (
        "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers"
        " FROM lineitem GROUP BY l_returnflag"
        " UNION ALL"
        " SELECT 'ALL' AS l_returnflag, count(DISTINCT l_suppkey)"
        " AS n_suppliers FROM lineitem"
    ),
    "sketch_theta_setops": (
        "WITH u AS (SELECT DISTINCT o_custkey FROM orders"
        "   WHERE o_orderpriority = '1-URGENT'),"
        " l AS (SELECT DISTINCT o_custkey FROM orders"
        "   WHERE o_orderpriority = '5-LOW')"
        " SELECT (SELECT count(*) FROM (SELECT * FROM u INTERSECT"
        "   SELECT * FROM l)) AS n_both,"
        " (SELECT count(*) FROM (SELECT * FROM u UNION"
        "   SELECT * FROM l)) AS n_either"
    ),
}
