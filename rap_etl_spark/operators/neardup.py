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
_SHINGLE_C = np.uint64(0x100000001B3)  # odd multiplier for the rolling poly
_EMPTY_SHINGLE = np.uint64(0x9E3779B97F4A7C15)  # shingle id of an empty doc


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 ndarray — the avalanche step that
    turns structured polynomial sums / xor'd seeds into uniform 64-bit
    values. Pure vectorized uint64 (wraparound is the point)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x


def _hash_seeds(n: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 1 << 62, size=n, dtype=np.int64).astype(np.uint64)


def minhash_signatures(
    df: DataFrame,
    col: str = "text",
    key: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(key, signature: array<long>) — MinHash over k-word shingles.

    Fully vectorized kernel (mapInPandas, numpy uint64 end-to-end — the
    per-row/per-shingle Python of the first iteration was the dominant cost
    of corpus dedup):

    1. the batch's words are flattened once; only the batch VOCABULARY
       (unique words, typically ≪ occurrences) is hashed in Python
       (blake2b — process-stable, unlike the salted builtin hash), then
       gathered back via factorize codes;
    2. shingle ids are a degree-k rolling polynomial over word hashes
       (k shifted multiply-adds over the flat array), finalized with
       splitmix64 — docs shorter than k words get one whole-doc shingle,
       empty docs a constant;
    3. hash i of the family is mix64(shingle ^ r_i) — xor+avalanche, no
       big-int modular arithmetic — and per-doc minima fall out of
       np.minimum.reduceat over the doc's shingle segment.

    Deterministic across any partitioning/batching of the input (property-
    tested), so signatures computed on different executors agree.
    """
    seeds = _hash_seeds(n_hashes, seed)
    spark = df.sparkSession
    b_seeds = spark.sparkContext.broadcast(seeds)
    out_schema = T.StructType(
        [
            df.schema[key],
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )

    import hashlib

    def _word_hash(w: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
        )

    k = shingle_k

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        R = b_seeds.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            words = pdf[col].fillna("").str.split()
            wlens = words.str.len().to_numpy(dtype=np.int64)
            flat = [w for lst in words for w in lst]
            # vocabulary-bounded Python: hash unique words only
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            uh = np.fromiter(
                (_word_hash(w) for w in uniq), dtype=np.uint64, count=len(uniq)
            )
            wh = uh[codes] if len(flat) else np.empty(0, np.uint64)
            sig_i64 = _sigs_from_elem_hashes(wh, wlens, k, n_hashes, R)
            yield pd.DataFrame(
                {
                    key: pdf[key].to_numpy(),
                    "signature": [sig_i64[j] for j in range(n)],
                }
            )

    return df.select(key, col).mapInPandas(sig_batches, schema=out_schema)


def _sigs_from_elem_hashes(
    wh: np.ndarray, wlens: np.ndarray, k: int, n_hashes: int, R: np.ndarray
) -> np.ndarray:
    """Shared vectorized minhash core: flat per-element 64-bit hashes `wh`
    (word hashes for text, mixed token values for token arrays) segmented
    by per-doc lengths `wlens` -> (n_docs, n_hashes) int64 signatures.
    Degree-k rolling-polynomial shingles + splitmix64 xor family; see
    minhash_signatures for the full spec."""
    n = len(wlens)
    with np.errstate(over="ignore"):
        pows = np.ones(k, dtype=np.uint64)
        for t in range(1, k):
            pows[t] = pows[t - 1] * _SHINGLE_C
        wstarts = np.zeros(n, dtype=np.int64)
        if n > 1:
            np.cumsum(wlens[:-1], out=wstarts[1:])

        # output shingle segments per doc
        slens = np.where(wlens >= k, wlens - k + 1, 1)
        sstarts = np.zeros(n, dtype=np.int64)
        if n > 1:
            np.cumsum(slens[:-1], out=sstarts[1:])
        shingles = np.empty(int(slens.sum()), dtype=np.uint64)

        total = len(wh)
        is_long = wlens >= k
        if total >= k and is_long.any():
            # rolling degree-k polynomial over the flat element hashes
            S = np.zeros(total - k + 1, dtype=np.uint64)
            for t in range(k):
                S += wh[t : total - k + 1 + t] * pows[t]
            # keep only windows fully inside one (long) doc
            doc_of = np.repeat(np.arange(n), wlens)
            valid = doc_of[: total - k + 1] == doc_of[k - 1 :]
            long_sh = _mix64(S[valid])
            shingles[np.repeat(is_long, slens)] = long_sh
        is_short = (wlens > 0) & (wlens < k)
        if is_short.any():
            # one whole-doc shingle: same polynomial, degree wlen-1
            occ_doc = np.repeat(np.arange(n), wlens)
            occ_pos = np.arange(total) - wstarts[occ_doc]
            short_occ = is_short[occ_doc]
            contrib = wh[short_occ] * pows[occ_pos[short_occ]]
            # start of each short doc's segment inside the compressed
            # `contrib` array = rank of its first occurrence among
            # all short-doc occurrences
            seg_starts = np.searchsorted(
                np.flatnonzero(short_occ), wstarts[np.flatnonzero(is_short)]
            )
            sums = np.add.reduceat(contrib, seg_starts)
            shingles[np.repeat(is_short, slens)] = _mix64(sums)
        is_empty = wlens == 0
        if is_empty.any():
            shingles[np.repeat(is_empty, slens)] = _mix64(
                np.full(int(is_empty.sum()), _EMPTY_SHINGLE)
            )

        # n_hashes minima over each doc's shingle segment
        sig = np.empty((n, n_hashes), dtype=np.uint64)
        for i in range(n_hashes):
            sig[:, i] = np.minimum.reduceat(_mix64(shingles ^ R[i]), sstarts)
        return sig.view(np.int64)


def minhash_signatures_tokens(
    df: DataFrame,
    col: str = "tokens",
    key: str = "doc_id",
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(key, signature) — MinHash over k-TOKEN shingles of an array<int>
    column. Same vectorized core as minhash_signatures, but the per-element
    hash is just splitmix64 of the token value — no string hashing at all,
    so the kernel is pure numpy end-to-end. This is the ingest-path variant:
    the CDC payload IS the token array (BASELINE.json input_hint), so
    near-dup detection on ingest never needs text."""
    seeds = _hash_seeds(n_hashes, seed)
    b_seeds = df.sparkSession.sparkContext.broadcast(seeds)
    out_schema = T.StructType(
        [
            df.schema[key],
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )
    k = shingle_k

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        R = b_seeds.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            toks = pdf[col].map(
                lambda a: np.asarray(a if a is not None else [], dtype=np.int64)
            )
            wlens = toks.map(len).to_numpy(dtype=np.int64)
            flat = (
                np.concatenate(toks.to_list())
                if wlens.sum()
                else np.empty(0, np.int64)
            )
            wh = _mix64(flat.view(np.uint64))
            sig_i64 = _sigs_from_elem_hashes(wh, wlens, k, n_hashes, R)
            yield pd.DataFrame(
                {
                    key: pdf[key].to_numpy(),
                    "signature": [sig_i64[j] for j in range(n)],
                }
            )

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
    xxhash64, sign-vote each bit weighted by term presence.

    ONE groupBy(key) with 64 fixed-width long sum buffers — a HashAggregate
    with map-side combine whose intermediate row count equals the WORD
    count. (The first iteration posexploded a 64-element vote array per
    word — a 64x row blowup into a (key, bit) shuffle; folding the votes
    into 64 aggregation buffers removes the blowup and the second shuffle.)
    Shift amounts must be literals in the Python API, so the 64 vote
    expressions are built statically — still codegen'd."""
    words = df.select(
        F.col(key), F.explode(F.array_distinct(F.split(F.col(col), r"\s+"))).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    # per bit i: vote_i = sum(+1 if bit set else -1) = 2*sum(bit_i) - n,
    # computed branch-free: 64 fixed-width sums of (h>>i)&1 plus one count
    votes = words.groupBy(key).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"_s{i}")
            for i in range(64)
        ],
    )
    votes = votes.select(
        key,
        "_n",
        *[(F.col(f"_s{i}") * 2 - F.col("_n")).alias(f"_v{i}") for i in range(64)],
    )
    # bit i set iff vote_i > 0; distinct powers of two sum to the packed
    # signed-int64 value (bit 63 contributes the sign bit)
    packed = None
    for i in range(64):
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        term = F.when(F.col(f"_v{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = term if packed is None else packed + term
    return votes.select(key, packed.alias("simhash"))


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
# ingest-path dedup (wired into CdcEngine.apply_batch via dedup_policy)
# --------------------------------------------------------------------------
def dedup_batch_tokens(
    df: DataFrame,
    policy: str = "exact",
    key: str = "doc_id",
    col: str = "tokens",
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Drop non-representative (near-)duplicate rows from one ingest batch,
    BEFORE they reach the table — the training-data-pipeline move of
    deduplicating at ingest rather than as an offline sweep. Operates on
    the token-array payload directly (no text needed).

    - ``exact``: rows whose token arrays are identical keep only the min-key
      representative. Grouping is on the ARRAY VALUE itself (no hash
      collisions); the shuffle carries only the already-reduced winner
      delta, not the raw batch.
    - ``minhash``: token-shingle MinHash -> LSH banding -> estimated-Jaccard
      verify -> connected components -> keep each cluster's min-key
      representative (graph.keep_representatives).

    Delete events (op='D') always pass through — a near-dup filter must
    never swallow a delete. Scope is the BATCH (cross-batch near-dups are
    an offline compaction concern; at ingest the delta is small enough
    that per-batch LSH is cheap)."""
    from pyspark.sql import Window

    has_op = "op" in df.columns
    live = df.filter(F.col("op") != F.lit("D")) if has_op else df
    dels = df.filter(F.col("op") == F.lit("D")) if has_op else None

    if policy == "exact":
        w = Window.partitionBy(F.col(col)).orderBy(F.col(key))
        kept = (
            live.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    elif policy == "minhash":
        from rap_etl_spark.operators.graph import keep_representatives

        sigs = minhash_signatures_tokens(
            live, col=col, key=key, n_hashes=n_hashes, shingle_k=shingle_k
        ).persist()
        try:
            pairs = lsh_candidate_pairs(sigs, key=key, n_bands=n_bands)
            sa = sigs.select(F.col(key).alias("a"), F.col("signature").alias("sig_a"))
            sb = sigs.select(F.col(key).alias("b"), F.col("signature").alias("sig_b"))
            verified = (
                pairs.join(sa, "a")
                .join(sb, "b")
                .withColumn(
                    "est_jaccard",
                    F.size(
                        F.filter(
                            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                            lambda m: m,
                        )
                    )
                    / F.lit(n_hashes),
                )
                .filter(F.col("est_jaccard") >= threshold)
                .select("a", "b")
            )
            kept = keep_representatives(live, verified, key=key)
        finally:
            sigs.unpersist()
    else:
        raise ValueError(f"unknown dedup policy: {policy!r}")
    return kept.unionByName(dels) if dels is not None else kept


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


def exact_window_pairs(
    df: DataFrame,
    col: str = "text",
    key: str = "doc_id",
    window: int = 40,
    stride: int = 16,
    max_docs_per_window: int = 8,
) -> DataFrame:
    """Exact-substring duplicate detection (the deduplicating-training-
    data construction of Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22 — public literature): two documents
    pair when they share ANY identical `window`-char substring sampled at
    `stride` offsets. Catches verbatim-copied passages (boilerplate,
    license blocks, quoted articles) that MinHash dilutes away in long
    documents — the exact complement of the probabilistic detectors.

    Scale shape: each doc emits ~len/stride fingerprints (md5 of the
    window — fixed 32-byte keys, the document text itself never joins),
    one distinct + one groupBy + one hash-key self-join. Windows shared
    by more than `max_docs_per_window` docs are DROPPED before the
    self-join (the LSH oversized-bucket rule): a universal boilerplate
    window would otherwise emit O(n^2) pairs — at corpus scale that
    window is a stop-fingerprint, not a duplication signal. Strided
    sampling means a copy shifted by a non-multiple of `stride` can be
    missed (the standard recall/cost dial; stride=1 is exhaustive).
    Docs shorter than `window` emit nothing."""
    wins = (
        df.filter(F.length(F.col(col)) >= window)
        .select(
            F.col(key),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.length(F.col(col)) - window,
                    F.lit(stride),
                )
            ).alias("p"),
            F.col(col),
        )
        .select(
            F.col(key),
            F.md5(F.col(col).substr(F.col("p") + 1, F.lit(window))).alias(
                "h"
            ),
        )
        .distinct()
    )
    ok = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_docs_per_window))
        .select("h")
    )
    a = wins.join(ok, "h").select("h", F.col(key).alias("a"))
    b = wins.join(ok, "h").select("h", F.col(key).alias("b"))
    return (
        a.join(b, "h")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def drop_existing_payloads(
    delta: DataFrame,
    corpus: DataFrame,
    key: str = "doc_id",
    col: str = "tokens",
) -> DataFrame:
    """Cross-batch incremental dedup: drop delta rows whose token payload
    ALREADY EXISTS in the corpus under a different key. The within-batch
    policies (dedup_batch_tokens) can't see history; this is the
    ingest-time probe against it.

    Scale shape — the corpus is the big side, so nothing wide ever moves:
    (1) fingerprint the delta (tiny) and BROADCAST its fp set into a
    column-pruned scan of the corpus fingerprints, keeping only the fps
    that collide (result is at most |delta| rows); (2) broadcast that tiny
    collision set back into an anti-join on the delta. Two narrow passes,
    only 8-byte fingerprints shuffle, never the corpus payloads. (In a
    production table the fp would be a materialized column so step (1)
    scans one parquet column; here it is derived on read, which parquet
    column pruning already limits to the token column.)

    Same-key rows always pass (an UPDATE whose payload equals its own
    stored payload is not a duplicate); delete events always pass."""
    fp = lambda c: F.xxhash64(c)  # noqa: E731 - array-value hash, no text

    has_op = "op" in delta.columns
    live = delta.filter(F.col("op") != F.lit("D")) if has_op else delta
    dels = delta.filter(F.col("op") == F.lit("D")) if has_op else None

    d = live.withColumn("_fp", fp(F.col(col)))
    corpus_fp = corpus.select(
        F.col(key).alias("_ck"), fp(F.col(col)).alias("_fp")
    )
    delta_fps = d.select("_fp").distinct()
    # (1) collision set: corpus fps that appear in the delta (broadcast
    # the DELTA side — it is the small one)
    collisions = corpus_fp.join(F.broadcast(delta_fps), "_fp").select(
        "_fp", "_ck"
    )
    # (2) anti-join the delta against the tiny collision set, keyed on
    # (fp, different key)
    kept = d.join(
        F.broadcast(collisions),
        (d["_fp"] == collisions["_fp"]) & (d[key] != collisions["_ck"]),
        "left_anti",
    ).drop("_fp")
    return kept.unionByName(dels) if dels is not None else kept
