"""Distributed global prefix-sum shard assignment (operators/sharding.py):
must equal the single-partition window it replaces, without ever planning a
SinglePartition exchange."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rap_etl_spark.operators.sharding import assign_shards, shard_stats

SHARD = 500


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(11)
    rows = [(f"doc-{i:05d}", rng.randrange(1, 120)) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id string, n_tok long")


def test_matches_single_partition_window(spark, docs):
    got = {
        r["doc_id"]: r["shard_id"]
        for r in assign_shards(docs, SHARD, num_partitions=16).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["doc_id"]: (r["ex"] or 0) // SHARD
        for r in docs.withColumn("ex", F.sum("n_tok").over(w)).collect()
    }
    assert got == ref


def test_no_single_partition_exchange(spark, docs):
    plan = (
        assign_shards(docs, SHARD, num_partitions=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_budget_property(spark, docs):
    stats = shard_stats(assign_shards(docs, SHARD, num_partitions=16)).collect()
    max_w = docs.agg(F.max("n_tok")).first()[0]
    last = max(r["shard_id"] for r in stats)
    for r in stats:
        # start-based rule: a shard spans [k*S, (k+1)*S) of the prefix sum,
        # plus the overhang of the straddling last doc
        assert r["total_tokens"] < SHARD + max_w
        if r["shard_id"] != last:
            assert r["total_tokens"] > SHARD - max_w


def test_deterministic_across_runs(spark, docs):
    a = sorted(map(tuple, assign_shards(docs, SHARD, num_partitions=4).collect()))
    b = sorted(map(tuple, assign_shards(docs, SHARD, num_partitions=32).collect()))
    assert a == b  # output independent of the partitioning


def test_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        assign_shards(docs, 0)
