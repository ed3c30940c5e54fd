"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
behind a deterministic fake (or NotImplementedError for real codecs) — but
the Spark-side plumbing is real and tested: schema shape, Arrow batch
transfer, mapInPandas signatures, partition sizing for large binaries.

At scale: binary payloads dominate partition size — the knobs that matter
are spark.sql.files.maxPartitionBytes (smaller when rows are MBs) and
arrow maxRecordsPerBatch (keep batches << executor memory). Feature
extraction never shuffles the binary column: extract first, project the
payload away, then shuffle only the (small) features.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(df: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media rows derived from the documents table —
    payload bytes are a seeded function of doc_id, so tests are stable."""
    return df.select(
        F.concat(F.lit(f"{kind}-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"application/x-fake-{kind}").alias("mime"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(512)) + 32).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.encode(F.repeat(F.sha2(F.col("doc_id").cast("string"), 256), 4), "utf-8").alias(
            "payload"
        ),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode would dispatch to PIL/libjpeg — unavailable in this
    container. Deterministic fake: bytes -> tiled uint8 'pixels'."""
    raise NotImplementedError(
        "image codecs not installed in this environment; "
        "use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for decode: hash-seeded uint8 (h, w) array."""
    seed = struct.unpack("<Q", hashlib.sha1(payload).digest()[:8])[0] % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, 'decode' each payload
    (fake decoder), reduce to a fixed-size feature vector (column means of a
    resized tile). The plumbing — batch shapes, binary transfer, projecting
    the payload away before any shuffle — is exactly what a real extractor
    needs; only the decoder body is fake."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, n_bytes, sha1s = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                raw = bytes(payload)
                n_bytes.append(len(raw))
                sha1s.append(hashlib.sha1(raw).hexdigest())
                img = fake_decode(raw, int(w) or 32, int(h) or 32)
                # "resize": crop/tile to (feat_dim, k) then column means
                cols = np.array_split(img.astype(np.float32), feat_dim, axis=1)
                feats.append(
                    np.array([c.mean() for c in cols], dtype=np.float32)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": np.array(n_bytes, dtype=np.int64),
                    "sha1": sha1s,
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode timestamps 0..duration step
    every_ms (JVM-side sequence), one output row per sampled frame — the
    decode of each frame is the stubbed step."""
    with_dur = media.withColumn(
        "duration_ms",
        F.coalesce(F.col("duration_ms"), (F.pmod(F.xxhash64("media_id"), F.lit(9000)) + 1000).cast("int")),
    )
    return with_dur.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Image resize plumbing: decode (fake) -> nearest-neighbor resample
    to (out_h, out_w) -> re-encode payload. The resample itself is REAL
    numpy index math (it operates on whatever array the decoder yields, so
    swapping fake_decode for a codec changes nothing else); output payload
    is the raw pixel buffer with updated metadata. Payloads never shuffle:
    mapInPandas rewrites them in place within the scan stage."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = fake_decode(bytes(payload), int(w) or 32, int(h) or 32)
                ys = (np.arange(out_h) * img.shape[0] // out_h)
                xs = (np.arange(out_w) * img.shape[1] // out_w)
                outs.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": np.full(len(pdf), out_w, dtype=np.int32),
                    "height": np.full(len(pdf), out_h, dtype=np.int32),
                    "payload": outs,
                }
            )

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)
