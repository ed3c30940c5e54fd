"""Mergeable-sketch operators (operators/sketches.py): exactness in the
sparse regime, mergeability (union of partials == direct), KLL rank
accuracy. (count_min_sketch exists as a SQL agg in Spark 4 but has no
estimate/query function — the stat-API accessor was removed — so it is
not part of the operator surface.)"""

from pyspark.sql import functions as F


def _li(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/lineitem.parquet")


def test_hll_merge_equals_direct(spark, sf_small):
    """Union of per-group HLL sketches must estimate the same cardinality
    as one direct sketch AND (sparse regime) the exact distinct."""
    li = _li(spark, sf_small)
    exact = li.select("l_suppkey").distinct().count()
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_suppkey")).alias("e")
    ).first()["e"]
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_suppkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    assert direct == exact == merged


def test_theta_set_algebra_exact_in_sparse_regime(spark, sf_small):
    from rap_etl_spark.operators.sketches import q_sketch_theta_setops

    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    urgent = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey").distinct()
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey"
    ).distinct()
    got = q_sketch_theta_setops(spark, sf_small).first()
    assert got["n_both"] == urgent.intersect(low).count()
    assert got["n_either"] == urgent.union(low).distinct().count()


def test_kll_quantiles_within_rank_epsilon(spark, sf_small):
    """KLL default k gives ~1.3% rank error; on the 1..50 quantity domain
    that is at most one adjacent value off the exact percentile."""
    from rap_etl_spark.operators.sketches import q_sketch_kll_quantiles

    li = _li(spark, sf_small)
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("median"),
            F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        )
        .collect()
    }
    for r in q_sketch_kll_quantiles(spark, sf_small).collect():
        e = exact[r["l_returnflag"]]
        for c in ("q25", "median", "q75"):
            assert abs(r[c] - e[c]) <= 1.0, (r["l_returnflag"], c, r[c], e[c])


def test_heavy_hitters_exact_when_uncapped(spark):
    from rap_etl_spark.operators.sketches import heavy_hitters

    rows = [(f"w{i % 7}",) for i in range(700)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "word string").repartition(8)
    got = {r["word"]: r["est_count"] for r in heavy_hitters(df, "word", k=8).collect()}
    assert got == {**{f"w{i}": 100 for i in range(7)}, "rare": 3}


def test_heavy_hitters_trimmed_regime_bounds(spark):
    """capacity << distincts: the true heavy hitter must still surface at
    rank 1 and every estimate is a lower bound on the true count."""
    import random

    from rap_etl_spark.operators.sketches import heavy_hitters

    rng = random.Random(3)
    rows = [("HOT",) for _ in range(5000)] + [
        (f"t{rng.randrange(2000)}",) for _ in range(5000)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "word string").repartition(8)
    out = heavy_hitters(df, "word", k=5, capacity=16).collect()
    assert out[0]["word"] == "HOT"
    true = {
        r["word"]: r["n"]
        for r in df.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in out:
        assert r["est_count"] <= true[r["word"]]
    # MG guarantee: undercount of any value <= total_rows / (capacity+1)
    # summed over partitions; HOT's estimate must stay dominant
    assert out[0]["est_count"] >= 5000 - 10000 // 17
