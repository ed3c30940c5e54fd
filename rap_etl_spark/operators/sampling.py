"""Corpus sampling & ordering operators for training-data pipelines.

Three shapes a 100-TB curation run needs:
- deterministic stratified sampling (reproducible across runs/engines —
  the sampling decision is a pure function of the key, not an RNG stream,
  so re-running the pipeline yields the SAME corpus and the choice is
  auditable per row);
- Bernoulli stratified sampling (`sampleBy` — statistically clean, not
  reproducible across partitionings);
- deterministic corpus shuffle (hash-order — the "global shuffle before
  training" step, expressible as one sort whose key is a pure function,
  so it is stable, resumable, and identical on every run).

All are single-pass JVM expressions; nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample_deterministic(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    pct_by_stratum: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Keep `pct`% of each stratum, decided by `key % 100` — reproducible,
    engine-independent, and joinable (the same key always makes the same
    cut). pct values are integer percents 0..100."""
    bucket = F.pmod(F.col(key_col).cast("long"), F.lit(100))
    pct = F.lit(default_pct)
    for stratum, p in sorted(pct_by_stratum.items()):
        pct = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(pct)
    return df.filter(bucket < pct)


def stratified_sample_bernoulli(
    df: DataFrame, strata_col: str, fractions: dict[str, float], seed: int = 7
) -> DataFrame:
    """Per-stratum Bernoulli sampling (pyspark sampleBy)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def deterministic_shuffle(
    df: DataFrame, key_col: str, seed: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """Global pseudo-random order by xxhash64(key, seed): the pre-training
    corpus shuffle as ONE range-partitioned sort (Spark samples boundaries,
    no driver collect). Changing `seed` gives an independent permutation;
    ties (duplicate keys) are broken by the key itself so the order is
    total and stable."""
    h = F.xxhash64(F.col(key_col), F.lit(seed))
    out = df.withColumn("_shuffle_key", h)
    if num_partitions is not None:
        out = out.repartitionByRange(num_partitions, "_shuffle_key", key_col)
    return out.sortWithinPartitions("_shuffle_key", key_col).drop("_shuffle_key") \
        if num_partitions is not None else (
        out.orderBy("_shuffle_key", key_col).drop("_shuffle_key")
    )


def mix_sources(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    scale: int = 1000,
) -> DataFrame:
    """Deterministic source mixing with repetition — the LLM data-recipe
    "epochs per source" (e.g. wiki x2.0, crawl x0.5) materialized as a
    pure function of the key: each row appears floor(w) times (an `epoch`
    column numbers the copies) plus one more iff key % scale < scale *
    frac(w). Reproducible across runs and engines, auditable per row, and
    shuffle-free: one CASE for the weight, sequence+explode for the
    epochs, a modulo filter for the fractional epoch. Rows whose stratum
    has no weight are dropped (weight 0)."""
    w = F.lit(0.0)
    for stratum, wt in sorted(weights.items()):
        w = F.when(F.col(strata_col) == stratum, F.lit(float(wt))).otherwise(w)
    n_copies = F.greatest(F.ceil(w).cast("int"), F.lit(1))
    bucket = F.pmod(F.col(key_col).cast("long"), F.lit(scale))
    out = df.withColumn("_w", w).withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), n_copies - 1))
    )
    keep = (F.col("epoch") < F.floor("_w")) | (
        bucket < F.lit(scale) * (F.col("_w") - F.floor("_w"))
    )
    return out.filter(keep).drop("_w")
