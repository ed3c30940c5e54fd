"""Skew handling (C5/J8): hot-key detection, salted repartition, salted join.

No reference analogue — rap-etl is per-record Python with no shuffle — but
the north rule mandates explicit skew handling for Zipf-hot doc_ids
(BASELINE.json north_rule: "salted repartitioning on skewed doc_id hot
keys"). AQE's skew-join splitting is left ON as belt-and-braces; these
operators cover the paths AQE does not (aggregation/window partitioning,
and pinned join strategies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, key: str, threshold_frac: float = 0.001, sample_frac: float | None = 0.05
) -> DataFrame:
    """Keys whose frequency exceeds threshold_frac of rows (estimated on a
    seeded sample so detection cost is O(sample), not O(df)). Returns a
    small DataFrame [key, est_count] suitable for broadcasting."""
    src = df.sample(fraction=sample_frac, seed=42) if sample_frac else df
    total = src.count()
    cutoff = max(1, int(total * threshold_frac))
    return (
        src.groupBy(key)
        .count()
        .filter(F.col("count") >= cutoff)
        .select(F.col(key), F.col("count").alias("est_count"))
    )


def salt_skew(
    df: DataFrame,
    key: str,
    buckets: int = 16,
    hot_keys: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a `_salt` column — 0 for cold keys, hash-spread over `buckets`
    for hot keys — and repartition on (key, _salt) so one hot key's rows
    land on `buckets` tasks instead of one.

    Salt is derived from `lsn` when present (deterministic under replay),
    else from a per-row id. With hot_keys=None every key is salted
    (uniform spreading, used when a downstream two-phase reduce follows).
    """
    spread_src = F.xxhash64(F.col("lsn")) if "lsn" in df.columns else F.xxhash64(
        F.monotonically_increasing_id()
    )
    spread = F.pmod(spread_src, F.lit(buckets))
    if hot_keys is not None:
        hot = hot_keys.select(F.col(key), F.lit(True).alias("_is_hot"))
        df = df.join(F.broadcast(hot), on=key, how="left")
        salted = df.withColumn(
            "_salt", F.when(F.col("_is_hot"), spread).otherwise(F.lit(0))
        ).drop("_is_hot")
    else:
        salted = df.withColumn("_salt", spread)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    return salted.repartition(n, key, "_salt")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """J8: equi-join resilient to hot keys on the big side. Big side gets a
    random-but-deterministic salt in [0, buckets); the small side is
    replicated `buckets`x via explode(sequence(...)) so every (key, salt)
    pair finds its match. Use when the small side is too big to broadcast
    but the big side is key-skewed."""
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(buckets)),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
