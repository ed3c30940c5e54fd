"""Mergeable-sketch aggregations (Apache DataSketches, JVM-side).

At 100 TB, exact distinct/set-algebra/quantile queries each cost a full
shuffle of the key domain; sketches replace that with a MERGEABLE fixed-
size state: map-side partial sketch per partition, a shuffle of kilobytes,
one merge. These operators exercise the full two-level pattern (sketch →
store per group → union/intersect across groups), which is also the
incremental-maintenance form: per-batch sketches persisted next to the
aggregate and folded in per micro-batch without re-reading history
(compare operators/incremental.py for the exact-distributive case).

Oracle note: all four entries are value-oracled against EXACT SQL because
every cardinality involved sits inside the sketches' exact regime — and
the HLL/theta sketches are sized (lgConfigK=21 / lgNomEntries=2^20) so
that regime holds at EVERY testdata SF, not just driver scale (at the
defaults, sf0.1's 10^3 suppliers already drifted 993-vs-1000). KLL's
k is capped at 65535, so its exact regime is driver-scale-only (largest
group ~20k rows at sf0.01; at sf0.1 the 200k-row groups compact and the
key would go approximate — documented, not driver-graded there). The
approximate regimes are pytest-gated (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rap_etl_spark.operators.relational import _t


def q_sketch_hll_union(spark, sf):
    """Two-level HLL distinct count: per-returnflag sketches of the
    supplier set, plus the cross-group union-merge (label 'ALL') — the
    merged estimate must equal the direct global distinct.

    lgConfigK=21 (the Spark/DataSketches maximum) keeps the sketch in
    its coupon (exact) mode up to ~10^5 distincts, so the exact-regime
    oracle holds at every testdata SF (sf0.1 suppliers = 10^3 already
    left the default lgK=12 regime: estimates drifted 993-vs-1000), at
    a sketch cost that is still KBs in sparse mode. The approximate
    regime stays pytest-gated (tests/test_sketches.py)."""
    li = _t(spark, sf, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_suppkey", 21).alias("sk")
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
    # lgNomEntries=20 (2^20 nominal) keeps theta in exact mode far past
    # every testdata SF (sf0.1 union ~1.5e4 > the default 4096 nominal),
    # same scale-robust exact-regime rationale as the HLL key above
    per = o.groupBy("o_orderpriority").agg(
        F.theta_sketch_agg("o_custkey", 20).alias("sk")
    )
    return per.agg(
        F.theta_sketch_estimate(F.theta_intersection_agg("sk")).alias(
            "n_both"
        ),
        F.theta_sketch_estimate(F.theta_union_agg("sk", 20)).alias("n_either"),
    )


def q_sketch_kll_quantiles(spark, sf):
    """KLL quantile sketch of l_quantity per returnflag — the mergeable
    alternative to exact percentiles (agg_percentile).

    Oracled via the same exact-regime trick as HLL/theta above: with
    k=65535 (the KLL maximum) every per-returnflag group at driver scale
    (~20k rows at sf0.01) fits inside the sketch's pre-compaction buffer,
    so ALL items are retained, partial-sketch merges stay exact, and
    get_quantile returns the true discrete order statistic — measured
    equal to DuckDB's quantile_disc. The compacted (approximate) regime's
    rank-epsilon guarantee is pytest-gated (tests/test_sketches.py)."""
    li = _t(spark, sf, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_quantity", F.lit(65535)).alias("sk")
    )
    return sk.select(
        "l_returnflag",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.25)).alias("q25"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("median"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.75)).alias("q75"),
    )


def heavy_hitters(df, col: str, k: int = 10, capacity: int = 4096):
    """Misra-Gries frequent items — the heavy-hitter sketch Spark lacks.

    Per-partition bounded counter summaries (mapInPandas: one pandas
    ``value_counts`` per Arrow batch, folded, then the batch-MG trim —
    subtract the (capacity+1)-th largest count and keep positives), merged
    by ONE groupBy-sum over <= capacity rows per partition, then top-k
    with a deterministic (count desc, value) tie-break.

    Scale: the shuffle carries at most capacity rows per partition no
    matter how large or skewed the column is (the point of the sketch);
    counts are lower bounds with per-partition undercount <= the trimmed
    threshold. EXACT whenever each partition's distinct count fits in
    `capacity` (no trim happens) — which is how the driver oracle checks
    it, same exact-regime pattern as the HLL/theta entries above.
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[col],
            T.StructField("_cnt", T.LongType(), False),
        ]
    )

    def summarize(batches):
        acc: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts(dropna=True).items():
                acc[v] = acc.get(v, 0) + int(c)
        if not acc:
            return
        s = pd.Series(acc).sort_values(ascending=False)
        if len(s) > capacity:
            s = (s - int(s.iloc[capacity])).iloc[:capacity]
            s = s[s > 0]
        yield pd.DataFrame({col: s.index, "_cnt": s.to_numpy()})

    merged = (
        df.select(col)
        .mapInPandas(summarize, schema=out_schema)
        .groupBy(col)
        .agg(F.sum("_cnt").alias("est_count"))
    )
    from pyspark.sql import Window

    # top-k via orderBy+limit (TakeOrderedAndProject) — the merged frame
    # is bounded by capacity x partitions, but there is no reason to sort
    # even that on one task; the rank window then runs over only k rows
    # (constant-partitioned, so no unpartitioned-window node remains)
    top = merged.orderBy(F.col("est_count").desc(), F.col(col)).limit(k)
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("est_count").desc(), F.col(col)
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        col, "est_count", "rank"
    )


def q_sketch_heavy_hitters(spark, sf):
    """Top-10 corpus words by frequency via the Misra-Gries sketch. At
    driver scale the synthetic vocabulary (~40 words) sits far inside
    capacity, so the sketch is exact and the oracle is the plain exact
    top-k; the pytest property gate covers the trimmed regime."""
    d = _t(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    return heavy_hitters(words, "word", k=10, capacity=4096)


SKETCH_QUERIES = {
    "sketch_heavy_hitters": q_sketch_heavy_hitters,
    "sketch_hll_union": q_sketch_hll_union,
    "sketch_theta_setops": q_sketch_theta_setops,
    "sketch_kll_quantiles": q_sketch_kll_quantiles,
}

SKETCH_ORACLES = {
    "sketch_heavy_hitters": (
        " WITH w AS (SELECT unnest(string_split(text, ' ')) AS word"
        "   FROM documents),"
        " c AS (SELECT word, CAST(count(*) AS BIGINT) AS est_count FROM w"
        "   GROUP BY word)"
        " SELECT word, est_count, CAST(row_number() OVER"
        "   (ORDER BY est_count DESC, word) AS INT) AS rank"
        " FROM c QUALIFY rank <= 10"
    ),
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
    "sketch_kll_quantiles": (
        "SELECT l_returnflag,"
        " quantile_disc(l_quantity, 0.25) AS q25,"
        " quantile_disc(l_quantity, 0.5) AS median,"
        " quantile_disc(l_quantity, 0.75) AS q75"
        " FROM lineitem GROUP BY l_returnflag"
    ),
}
