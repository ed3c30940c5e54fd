"""Deduplication operators for training-data curation: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale design: everything is shuffle-by-small-key. MinHash LSH shuffles on
(band_id, band_hash) — O(n_docs x n_bands) small rows, never a cross
product; candidate pairs are verified only within buckets. SimHash buckets
on rotated bit-prefixes. Exact dedup is one hash-groupBy with map-side
combine. No per-row Python: signatures are computed with numpy over Arrow
batches (mapInPandas); hashing/bucketing is JVM-side where expressible.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def dedup_exact(df: DataFrame, col: str = "text", key: str = "doc_id") -> DataFrame:
    """Keep one representative (min key) per exact content hash."""
    h = F.md5(F.col(col))
    return (
        df.withColumn("_fp", h)
        .groupBy("_fp")
        .agg(F.min(key).alias(key), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dup_groups(df: DataFrame, col: str = "text") -> DataFrame:
    """Content hashes appearing more than once (the duplicate report)."""
    return (
        df.groupBy(F.md5(F.col(col)).alias("fp"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------
_M61 = (1 << 61) - 1  # Mersenne prime modulus for the hash family


def _hash_family(n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _M61, size=n, dtype=np.int64)
    b = rng.randint(0, _M61, size=n, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    col: str = "text",
    key: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(key, signature: array<long>) — MinHash over k-word shingles.

    mapInPandas: per Arrow batch, shingle -> stable 64-bit shingle ids ->
    n_hashes universal hashes -> column-wise min. numpy throughout."""
    a, b = _hash_family(n_hashes, seed)
    spark = df.sparkSession
    b_a = spark.sparkContext.broadcast(a)
    b_b = spark.sparkContext.broadcast(b)
    out_schema = T.StructType(
        [
            df.schema[key],
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )

    import hashlib

    def _stable_id(s: str) -> int:
        # NOT python hash(): that is salted per process (PYTHONHASHSEED) and
        # would give different signatures on different workers
        return int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
        ) & 0x1FFFFFFFFFFFFFFF

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        A = b_a.value.astype(np.object_)  # python ints: exact 61-bit modmul
        B = b_b.value.astype(np.object_)
        for pdf in batches:
            keys, sigs = [], []
            for k_, text in zip(pdf[key], pdf[col]):
                words = text.split()
                if len(words) < shingle_k:
                    shingles = [" ".join(words)]
                else:
                    shingles = [
                        " ".join(words[i : i + shingle_k])
                        for i in range(len(words) - shingle_k + 1)
                    ]
                ids = np.array(
                    [_stable_id(s) for s in shingles], dtype=np.object_
                )
                # (n_hashes, n_shingles) universal hash, min per row
                hx = (A[:, None] * ids[None, :] + B[:, None]) % _M61
                sigs.append(hx.min(axis=1).astype(np.int64))
                keys.append(k_)
            yield pd.DataFrame({key: keys, "signature": sigs})

    return df.select(key, col).mapInPandas(sig_batches, schema=out_schema)


def lsh_candidate_pairs(
    signatures: DataFrame, key: str = "doc_id", n_bands: int = 16
) -> DataFrame:
    """Band the signatures, bucket-join within (band, band_hash):
    returns candidate pairs (a, b) with a < b. The shuffle key is the band
    bucket — no all-pairs comparison ever materializes."""
    n_hashes = 64  # callers using a different width pass matching bands
    rows_per_band = None
    sig_len = len(signatures.select("signature").first()["signature"])
    rows_per_band = sig_len // n_bands
    banded = signatures.select(
        F.col(key),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(
                        F.col("signature"),
                        i * rows_per_band + 1,
                        rows_per_band,
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(F.col(f"a.{key}").alias("a"), F.col(f"b.{key}").alias("b"))
        .distinct()
    )
    return pairs


def minhash_near_dups(
    df: DataFrame,
    col: str = "text",
    key: str = "doc_id",
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.7,
    shingle_k: int = 5,
) -> DataFrame:
    """End-to-end near-dup pairs: MinHash -> LSH buckets -> verify candidate
    pairs by estimated Jaccard (signature agreement) >= threshold."""
    sigs = minhash_signatures(df, col, key, n_hashes, shingle_k)
    sigs = sigs.persist()
    pairs = lsh_candidate_pairs(sigs, key, n_bands)
    sa = sigs.select(F.col(key).alias("a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(key).alias("b"), F.col("signature").alias("sig_b"))
    verified = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(n_hashes),
                4,
            ),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )
    return verified


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash(df: DataFrame, col: str = "text", key: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word features, computed JVM-side: per word take
    xxhash64, sign-vote each bit weighted by term presence. Expressed as an
    explode + bitwise aggregation — no Python."""
    words = df.select(
        F.col(key), F.explode(F.array_distinct(F.split(F.col(col), r"\s+"))).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    # per (key, bit): vote = sum(+1 if bit set else -1); bit set iff vote > 0.
    # shift amounts must be literals in the Python API, so the 64 bit-vote
    # expressions are built statically (one array expr, still codegen'd)
    bit_votes = F.array(
        *[
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
            for i in range(64)
        ]
    )
    bits = words.select(key, F.posexplode(bit_votes).alias("bit", "vote"))
    votes = bits.groupBy(key, "bit").agg(F.sum("vote").alias("v"))
    sig = votes.groupBy(key).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
        ).alias("simhash")
    )
    return sig


def simhash_near_dups(
    df: DataFrame, col: str = "text", key: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 4 x 16-bit chunks (any pair
    within hamming distance 3 must agree on >=1 chunk — pigeonhole), verify
    hamming distance via bit_count(xor)."""
    sig = simhash(df, col, key).persist()
    chunk_exprs = F.array(
        *[
            F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ]
    )
    chunks = sig.select(
        key,
        "simhash",
        F.posexplode(chunk_exprs).alias("chunk_id", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(
            F.col(f"a.{key}").alias("a"),
            F.col(f"b.{key}").alias("b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, for verification / small candidate sets)
# --------------------------------------------------------------------------
def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Exact word-set Jaccard for given candidate pairs (a, b)."""
    wordsets = df.select(
        F.col(key), F.array_distinct(F.split(F.col(col), r"\s+")).alias("ws")
    )
    a = wordsets.select(F.col(key).alias("a"), F.col("ws").alias("ws_a"))
    b = wordsets.select(F.col(key).alias("b"), F.col("ws").alias("ws_b"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("ws_a", "ws_b"))
                / F.size(F.array_union("ws_a", "ws_b")),
                4,
            ),
        )
        .select("a", "b", "jaccard")
    )
