"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — JVM-side dot products via
zip_with/aggregate (whole-stage codegen, no Python). Scale path: LSH
bucketing (random hyperplanes) so candidate generation shuffles on bucket
ids instead of scanning all pairs, and an IVF-style coarse quantizer
(k-means-lite) that prunes the search to the closest partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_to_query(
    df: DataFrame, query: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """Cosine similarity of every row to one query vector — JVM-side."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.linalg.norm(np.asarray(query, dtype=np.float64)))
    return df.withColumn(
        "cosine",
        _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)),
    )


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors of a query vector. Spark plans this as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    return (
        cosine_to_query(df, query, vec_col)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of <v, r_i> packed into a bucket
    id. Cosine-similar vectors collide with high probability; candidate
    search shuffles on bucket id (small) instead of all pairs. Computed in
    one vectorized numpy matmul per Arrow batch."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)
    b_planes = df.sparkSession.sparkContext.broadcast(planes)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("bucket", T.LongType(), False)]
    )

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = b_planes.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            signs = (M @ P.T) > 0  # (n, n_planes)
            bucket = signs @ (1 << np.arange(P.shape[0], dtype=np.int64))
            out = pdf.copy()
            out["bucket"] = bucket.astype(np.int64)
            yield out

    return df.mapInPandas(bucketize, schema=out_schema)


def lsh_topk(
    df: DataFrame,
    query: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    `probe_hamming` bit flips of the query's bucket (multi-probe). At scale
    the bucketed table is precomputed/persisted; the probe is a bucket-id
    IN-list lookup — partition-prunable, no full scan."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)
    q = np.asarray(query, dtype=np.float64)
    q_bucket = int(((planes @ q) > 0) @ (1 << np.arange(n_planes, dtype=np.int64)))
    probes = [q_bucket]
    if probe_hamming >= 1:
        probes += [q_bucket ^ (1 << i) for i in range(n_planes)]
    if probe_hamming >= 2:
        probes += [
            q_bucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    bucketed = hyperplane_lsh_buckets(df, dim, n_planes, vec_col, seed)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query, k, vec_col, id_col)


def ivf_assign(
    df: DataFrame,
    n_centroids: int = 16,
    dim: int | None = None,
    vec_col: str = "embedding",
    sample_frac: float = 0.2,
    iters: int = 5,
    seed: int = 42,
    max_sample: int = 100_000,
):
    """IVF coarse quantizer: k-means on a driver-side sample (centroid count
    is tiny), then distributed assignment via one numpy matmul per batch.
    Returns (assigned_df with 'centroid' column, centroids ndarray). At
    scale the assigned table is written partitioned by centroid so a query
    probes only the nearest partitions (partition pruning).

    The driver collect is HARD-CAPPED at `max_sample` rows regardless of
    table size (centroid fitting needs ~100k vectors no matter how big the
    corpus is) — sample_frac alone would scale the collect with the table
    and OOM the driver at corpus scale."""
    sample = (
        df.select(vec_col).sample(sample_frac, seed=seed).limit(max_sample).toPandas()
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            pts = X[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    b_cent = df.sparkSession.sparkContext.broadcast(cent)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("centroid", T.IntegerType(), False)]
    )

    def assign_batches(batches):
        C = b_cent.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            d = (M**2).sum(1)[:, None] - 2 * (M @ C.T) + (C**2).sum(1)[None, :]
            out = pdf.copy()
            out["centroid"] = d.argmin(axis=1).astype(np.int32)
            yield out

    return df.mapInPandas(assign_batches, schema=out_schema), cent


def banded_lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """n_bands independent hyperplane signatures per vector in ONE matmul
    pass: (n, n_bands*n_planes) signs, split into per-band bucket ids.
    Output is exploded long form (id, band, bucket) — the shuffle key for
    candidate generation is (band, bucket), never the raw vector."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_bands * n_planes, dim)).astype(np.float64)
    b_planes = df.sparkSession.sparkContext.broadcast(planes)
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    )
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = b_planes.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            signs = (M @ P.T) > 0  # (n, n_bands*n_planes)
            buckets = signs.reshape(len(pdf), n_bands, n_planes) @ weights
            ids = np.repeat(pdf[id_col].to_numpy(), n_bands)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int32), len(pdf)
                    ),
                    "bucket": buckets.reshape(-1).astype(np.int64),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(sig, schema=out_schema)


def embed_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 4,
    max_bucket: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Scale shape (never all-pairs): banded hyperplane LSH → candidates are
    pairs colliding in ANY band, generated by a self-join on (band, bucket)
    — a sort-merge join keyed on small ints, with oversized buckets
    (degenerate regions, e.g. the all-zeros region) dropped at `max_bucket`
    like the super-node drop in graph.connected_components; pair dedup
    across bands is one distinct on (a, b); only then are the two vectors
    fetched and the EXACT cosine verified JVM-side. Precision is therefore
    exact; recall is the LSH collision probability (pytest-gated — at
    threshold ~1 a near-dup collides in every band)."""
    sigs = banded_lsh_signatures(
        df, dim, n_planes, n_bands, vec_col, id_col, seed
    )
    ok_buckets = (
        sigs.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket))
        .select("band", "bucket")
    )
    sigs = sigs.join(ok_buckets, ["band", "bucket"])
    left = sigs.select("band", "bucket", F.col(id_col).alias("a"))
    right = sigs.select("band", "bucket", F.col(id_col).alias("b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn(
            "cosine",
            _dot(F.col("_va"), F.col("_vb"))
            / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: assign once, probe the n_probe closest centroids only."""
    assigned, cent = ivf_assign(df, n_centroids, vec_col=vec_col)
    q = np.asarray(query, dtype=np.float64)
    d = ((cent - q) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:n_probe]]
    cand = assigned.filter(F.col("centroid").isin(probe))
    return brute_force_topk(cand, query, k, vec_col, id_col)
