"""Vectorized token-array kernels (SURVEY.md C11, V1-V6).

The binding contract (BASELINE.json input_hint): all token-array
manipulation runs through vectorized pandas/Arrow UDFs — no per-row Python.
Where a native Spark SQL function expresses the op (size, slice, concat,
transform), we prefer it (stays in whole-stage codegen, no Python at all);
the pandas-UDF forms exist for ops the built-ins can't express and to keep
the Arrow path exercised/tested.

Kernels operate on numpy inside each Arrow batch: flattened values +
offsets (np.add.reduceat) rather than per-row Python loops.
"""

from __future__ import annotations

from typing import Iterator  # noqa: UP035 - pyspark resolves UDF type hints

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------- native (preferred: JVM codegen, zero Python) ----------
def recount_tokens(df: DataFrame, col: str = "tokens", out: str = "n_tok") -> DataFrame:
    return df.withColumn(out, F.size(F.col(col)).cast("int"))


def clip_tokens(df: DataFrame, max_len: int, col: str = "tokens") -> DataFrame:
    return df.withColumn(col, F.slice(F.col(col), 1, max_len))


def hash_tokens(df: DataFrame, col: str = "tokens", out: str = "tok_hash") -> DataFrame:
    return df.withColumn(out, F.xxhash64(F.col(col)))


def shift_tokens(df: DataFrame, offset: int, col: str = "tokens") -> DataFrame:
    """Vocabulary-offset remap, natively: transform(tokens, t -> t + k)."""
    return df.withColumn(
        col, F.transform(F.col(col), lambda t: t + F.lit(offset))
    )


# ---------- Arrow/pandas kernels (batch-vectorized numpy) ----------
def _flatten(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Series of arrays -> (flat values, row lengths, reduceat offsets)."""
    lens = series.map(len).to_numpy(dtype=np.int64)
    flat = np.concatenate([np.asarray(a) for a in series]) if len(series) else np.array([])
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:]) if len(lens) > 1 else None
    return flat, lens, starts


@pandas_udf(T.IntegerType())
def token_count_py(tokens: pd.Series) -> pd.Series:
    """Arrow-batched length kernel (pandas-UDF form of F.size)."""
    return tokens.map(len).astype("int32")


@pandas_udf(T.LongType())
def token_sum_py(tokens: pd.Series) -> pd.Series:
    """Sum of token ids per row via np.add.reduceat over the flattened batch
    — one numpy call per Arrow batch, no per-row Python arithmetic."""
    flat, lens, starts = _flatten(tokens)
    out = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    if flat.size:
        sums = np.add.reduceat(flat.astype(np.int64), starts[nz])
        out[nz] = sums
    return pd.Series(out)


def clipped_token_sum_py(max_len: int):
    """Factory: pandas UDF computing sum(tokens[:max_len]) per row."""

    @pandas_udf(T.LongType())
    def _udf(tokens: pd.Series) -> pd.Series:
        clipped = tokens.map(lambda a: np.asarray(a[:max_len], dtype=np.int64))
        flat, lens, starts = _flatten(clipped)
        out = np.zeros(len(lens), dtype=np.int64)
        nz = lens > 0
        if flat.size:
            out[nz] = np.add.reduceat(flat, starts[nz])
        return pd.Series(out)

    return _udf


def remap_token_sum_iter(a: int, b: int, mod: int, table_size: int = 1 << 16):
    """Factory: V2 ITERATOR pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``, SURVEY.md §2.2 V2) computing
    ``sum((a*t + b) % mod)`` over each row's token array.

    The iterator form exists for AMORTIZED PER-BATCH SETUP: the remap
    lookup table (the stand-in for any expensive per-worker init — loading
    a vocab, compiling an automaton, opening a model) is built ONCE per
    Python worker when the iterator starts, then reused across every Arrow
    batch the executor streams through — a Series→Series UDF would pay the
    setup on every batch. Requires token values < table_size."""

    @pandas_udf(T.LongType())
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time setup, amortized over all batches of this partition
        table = (a * np.arange(table_size, dtype=np.int64) + b) % mod
        for tokens in batches:
            flat, lens, starts = _flatten(
                tokens.map(lambda x: x if x is not None else [])
            )
            out = np.zeros(len(lens), dtype=np.int64)
            nz = lens > 0
            if flat.size:
                out[nz] = np.add.reduceat(table[flat.astype(np.int64)], starts[nz])
            yield pd.Series(out)

    return _udf


@pandas_udf(T.DoubleType())
def token_mean_py(tokens: pd.Series) -> pd.Series:
    flat, lens, starts = _flatten(tokens)
    out = np.full(len(lens), np.nan)
    nz = lens > 0
    if flat.size:
        out[nz] = np.add.reduceat(flat.astype(np.float64), starts[nz]) / lens[nz]
    return pd.Series(out)


# ---------- packed wire format (EVENTS_SCHEMA_PACKED) ----------
@pandas_udf(T.BinaryType())
def pack_tokens_py(tokens: pd.Series) -> pd.Series:
    """array<int32> -> packed little-endian int32 bytes (the WAL wire form).
    One astype+tobytes per Arrow batch; per-row work is a C-level slice."""
    flat, lens, starts = _flatten(tokens.map(lambda a: a if a is not None else []))
    buf = flat.astype("<i4").tobytes() if flat.size else b""
    out = [
        None if a is None else buf[s * 4 : (s + n) * 4]
        for a, s, n in zip(tokens, starts, lens)
    ]
    return pd.Series(out, dtype=object)


@pandas_udf(T.ArrayType(T.IntegerType()))
def unpack_tokens_py(blob: pd.Series) -> pd.Series:
    """packed bytes -> array<int32>; np.frombuffer is a zero-copy view."""
    return pd.Series(
        [None if b is None else np.frombuffer(b, dtype="<i4") for b in blob],
        dtype=object,
    )


def pack_tokens(df: DataFrame, col: str = "tokens", out: str = "tokens_bin") -> DataFrame:
    return df.withColumn(out, pack_tokens_py(F.col(col))).drop(col)


def unpack_tokens(df: DataFrame, col: str = "tokens_bin", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, unpack_tokens_py(F.col(col))).drop(col)


def concat_tokens_per_key(df: DataFrame, key: str, col: str = "tokens") -> DataFrame:
    """Grouped-map assembly (V3): concatenate a key's token arrays in lsn
    order into one sequence — the per-record triple-set assembly of the
    reference, generalized. applyInPandas: one Arrow batch per key group."""
    order_col = "lsn" if "lsn" in df.columns else col

    out_schema = T.StructType(
        [
            T.StructField(key, df.schema[key].dataType),
            T.StructField("tokens", df.schema[col].dataType),
            T.StructField("n_tok", T.IntegerType()),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        arrs = [np.asarray(a) for a in pdf[col] if a is not None]
        flat = np.concatenate(arrs) if arrs else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "tokens": [flat], "n_tok": [len(flat)]}
        )

    return df.groupBy(key).applyInPandas(assemble, schema=out_schema)
