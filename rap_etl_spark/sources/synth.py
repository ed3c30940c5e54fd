"""Deterministic change-event synthesis (FIXTURES.md §B).

The reference's input is an external API harvest; ours is a WAL/binlog tail.
Since the sandbox has no real binlog, we synthesize one — deterministically
and *distributed*: every field of event ``lsn`` is a pure function of
``lsn`` (counter-based hashing, no stateful RNG), so the same log is
produced regardless of partitioning or parallelism, and generation scales
to 10^8+ events without a driver-side loop.

Key-space skew is Zipf(s≈1.2) over the doc_id universe (drawn from the
driver testdata ``documents`` table at a chosen sf) — a few hot keys
dominate, exercising the salting path (BASELINE.json north_star).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rap_etl_spark.schemas import EVENTS_SCHEMA, EVENTS_SCHEMA_PACKED, EVENTS_SCHEMA_V2

VOCAB = 50257  # GPT-2-ish vocab size for synthetic token ids
_EPOCH_US = np.int64(1704067200000000)  # 2024-01-01T00:00:00Z in microseconds


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash: uint64 -> uint64 (public-domain splitmix64)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(lsn: np.ndarray, stream: int) -> np.ndarray:
    """Uniform [0,1) derived from (lsn, stream) — deterministic per row."""
    h = _splitmix64(
        lsn.astype(np.uint64)
        ^ np.uint64((stream * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def zipf_cdf(n_keys: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_keys + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


def doc_id_universe(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """doc_id key space from the testdata documents table: 'doc-<id>'."""
    ids = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .toPandas()["doc_id"]
        .to_numpy()
    )
    return np.sort(ids)


def synthesize_events(
    spark: SparkSession,
    sf_dir: str,
    n_events: int,
    *,
    max_tok: int = 64,
    zipf_s: float = 1.2,
    dup_frac: float = 0.05,
    evolve_at_lsn: int | None = None,
    sources: int = 8,
    seed: int = 42,
    packed: bool = False,
    staging_dir: str | None = None,
    n_keys: int | None = None,
) -> DataFrame:
    """Synthesize ``n_events`` base change events (plus ~dup_frac duplicate
    deliveries) over the sf_dir documents key space.

    If ``evolve_at_lsn`` is set, events with lsn >= that value use the
    evolved schema (added ``lang`` column, int64 tokens/n_tok) — the whole
    returned frame is then in the V2 schema with NULL lang / int64 casts for
    pre-cutover rows (callers that need the raw two-phase log should call
    twice and keep the frames separate).
    """
    if packed and evolve_at_lsn is not None:
        raise ValueError("packed wire format supports the v1 (int32) schema only")
    if n_keys is not None:
        # synthetic key universe 'doc-0'..'doc-<n-1>': decouples the key
        # cardinality (and therefore delta/merge volume) from the testdata
        # documents table — the merge-heavy bench scenario needs ~10^6 keys
        # where sf0.1 only provides 5000
        doc_nums = np.arange(n_keys, dtype=np.int64)
    else:
        doc_nums = doc_id_universe(spark, sf_dir)
    cdf = zipf_cdf(len(doc_nums), zipf_s)
    b_docs = spark.sparkContext.broadcast(doc_nums)
    b_cdf = spark.sparkContext.broadcast(cdf)
    evolved_all = evolve_at_lsn is not None and evolve_at_lsn <= 0

    if packed:
        out_schema = EVENTS_SCHEMA_PACKED
    else:
        out_schema = EVENTS_SCHEMA_V2 if evolve_at_lsn is not None else EVENTS_SCHEMA
    tok_dtype = np.int64 if evolve_at_lsn is not None else np.int32

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        docs = b_docs.value
        cdf_ = b_cdf.value
        langs = np.array(["en", "es", "zh", "de", "fr", "ja", "pt", "ru"])
        for pdf in batches:
            lsn = pdf["id"].to_numpy(dtype=np.int64)
            n = len(lsn)
            if n == 0:
                continue
            # key choice: Zipf rank via inverse-CDF, then a seeded permutation
            # of ranks so hot keys are spread across the id space
            rank = np.searchsorted(cdf_, _u01(lsn, seed), side="left")
            rank = np.minimum(rank, len(docs) - 1)
            perm_rank = _splitmix64(rank.astype(np.uint64) ^ np.uint64(seed)) % np.uint64(
                len(docs)
            )
            doc_num = docs[perm_rank.astype(np.int64)]
            # op mix: ~20% I, 70% U, 10% D (first-per-key fixed up later)
            u_op = _u01(lsn, seed + 1)
            op = np.where(u_op < 0.2, "I", np.where(u_op < 0.9, "U", "D"))
            # payload: derived from (doc_num, lsn)
            h = _splitmix64(
                doc_num.astype(np.uint64) * np.uint64(31) ^ lsn.astype(np.uint64) * np.uint64(13)
            )
            n_tok = (h % np.uint64(max_tok)).astype(np.int64) + 1
            starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
            total = int(n_tok.sum())
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, n_tok)
            base = np.repeat(doc_num * 31 + lsn * 13, n_tok)
            # hash-mixed per position: HIGH-ENTROPY token ids. Real token
            # streams don't dictionary-compress to nothing; an arithmetic
            # sequence here made parquet decode unrealistically free and
            # benchmarks overhead-bound.
            flat = (
                _splitmix64((base + pos).astype(np.uint64)) % np.uint64(VOCAB)
            ).astype(tok_dtype)
            if packed:
                # wire form: one <i4 blob per row (C-level slices of one
                # contiguous buffer — no per-row Python arithmetic)
                buf = flat.astype("<i4").tobytes()
                tokens = [
                    buf[int(s) * 4 : int(s + n) * 4]
                    for s, n in zip(starts, n_tok)
                ]
            else:
                tokens = np.split(flat, np.cumsum(n_tok)[:-1])
            src = np.char.add(
                "src", ((h >> np.uint64(17)) % np.uint64(sources)).astype(np.int64).astype(str)
            )
            ts = pd.to_datetime(_EPOCH_US + lsn * 100_000, unit="us")
            out = pd.DataFrame(
                {
                    "op": op,
                    "doc_id": np.char.add("doc-", doc_num.astype(str)),
                    "lsn": lsn,
                    ("tokens_bin" if packed else "tokens"): pd.Series(
                        list(tokens), dtype=object
                    ),
                    "n_tok": n_tok,
                    "source": src,
                    "ingest_ts": ts,
                }
            )
            if packed:
                out = out[
                    ["op", "doc_id", "lsn", "tokens_bin", "n_tok", "source", "ingest_ts"]
                ]
            if evolve_at_lsn is not None:
                lang_vals = langs[
                    (_splitmix64(doc_num.astype(np.uint64)) % np.uint64(len(langs))).astype(
                        np.int64
                    )
                ]
                evolved = lsn >= evolve_at_lsn
                out["lang"] = np.where(evolved, lang_vals, None)
                out = out[
                    ["op", "doc_id", "lsn", "tokens", "n_tok", "source", "lang", "ingest_ts"]
                ]
            yield out

    base = (
        spark.range(0, n_events)
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
        .mapInPandas(gen, schema=out_schema)
    )
    if staging_dir is not None:
        # The downstream fixup (first-I join) and duplicate-delivery union
        # would otherwise re-execute the Python generator 3x per consuming
        # action. Staging the raw generation once turns every later pass
        # into a plain JVM parquet scan — essential at 10^8-event prep.
        base.write.mode("overwrite").option("compression", "zstd").parquet(staging_dir)
        base = spark.read.parquet(staging_dir)

    # first event per key must be 'I' (FIXTURES.md B2): key-min-lsn is a tiny
    # aggregate (|keys| rows) — broadcast-joined back, no big-side shuffle
    first = base.groupBy("doc_id").agg(F.min("lsn").alias("_min_lsn"))
    base = (
        base.join(F.broadcast(first), on="doc_id", how="left")
        .withColumn(
            "op", F.when(F.col("lsn") == F.col("_min_lsn"), F.lit("I")).otherwise(F.col("op"))
        )
        .drop("_min_lsn")
    )
    # null the payload on deletes (a fixed-up first-'I' keeps its payload)
    payload_cols = ["tokens_bin" if packed else "tokens", "n_tok", "source"]
    for c in payload_cols + (["lang"] if evolve_at_lsn is not None else []):
        base = base.withColumn(c, F.when(F.col("op") == "D", F.lit(None)).otherwise(F.col(c)))

    # duplicate deliveries: a seeded ~dup_frac of events emitted twice with
    # identical (doc_id, lsn) — exercises C1 dedup
    if dup_frac > 0:
        dup_sel = F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 7)), F.lit(10_000)) < int(
            dup_frac * 10_000
        )
        base = base.unionAll(base.filter(dup_sel))
    _ = evolved_all  # (v2-only logs: caller passes evolve_at_lsn=0)
    return base


def write_event_log(
    events: DataFrame, out_dir: str, n_batches: int, n_events: int
) -> None:
    """Write the log as `batch=<i>/` parquet partitions — contiguous LSN
    ranges so file-tail streaming replays in a realistic WAL order."""
    with_batch = events.withColumn(
        "batch",
        F.least(
            F.lit(n_batches - 1),
            (F.col("lsn") * n_batches / F.lit(n_events)).cast("int"),
        ),
    )
    # zstd: realistic for a read-heavy WAL, and decode work scales with
    # cores (snappy/uncompressed bit-unpacking is memory-bandwidth-bound)
    with_batch.write.mode("overwrite").option("compression", "zstd").partitionBy(
        "batch"
    ).parquet(out_dir)
