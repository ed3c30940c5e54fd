"""Training-sequence packing: assemble variable-length tokenized documents
into fixed-length training sequences (the step between a curated corpus and
a dataloader — every large-model data pipeline ends with it).

Scale design: packing is done INDEPENDENTLY PER PARTITION via mapInPandas
(next-fit over the partition's docs) — zero coordination, zero shuffle
beyond an optional repartition, linear in tokens. A globally-optimal bin
packing would need all doc lengths on one node; per-shard next-fit is the
standard practice (waste is bounded and measured, not hidden: emit
fill_ratio per sequence and let the caller decide whether to re-pack the
tail). Long documents are chunked to seq_len pieces first, so a single doc
can never overflow a sequence.

Inside each Arrow batch the token work is vectorized (one concatenate +
reduceat/slice per batch); the only Python loop is over per-doc LENGTHS
(O(docs), integer-only), not over tokens.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_ids", T.ArrayType(T.StringType()), False),
        T.StructField("fill_ratio", T.DoubleType(), False),
    ]
)


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack (id, tokens) rows into sequences of at most `seq_len` tokens.

    Each output row is one training sequence: its tokens (concatenated doc
    pieces, never crossing seq_len), the contributing doc ids (a chunked
    doc contributes its id once per piece), and the fill ratio. seq_id is
    `<partitionId>-<i>` — deterministic for a fixed partitioning.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    src = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(tokens_col).alias("tokens")
    )
    if num_partitions is not None:
        src = src.repartition(num_partitions, "doc_id")

    def pack_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        # carry an open (unfinished) sequence across Arrow batches so batch
        # boundaries don't force short sequences
        open_toks: list[np.ndarray] = []
        open_ids: list[str] = []
        open_len = 0
        seq_i = 0

        def emit(rows, toks, ids, n):
            nonlocal seq_i
            rows.append(
                (
                    f"{pid}-{seq_i}",
                    np.concatenate(toks) if toks else np.array([], np.int32),
                    n,
                    len(ids),
                    list(ids),
                    n / seq_len,
                )
            )
            seq_i += 1

        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, arr in zip(pdf["doc_id"], pdf["tokens"]):
                if arr is None or len(arr) == 0:
                    continue
                a = np.asarray(arr, dtype=np.int32)
                # chunk long docs to seq_len pieces (C-level slices)
                for s in range(0, len(a), seq_len):
                    piece = a[s : s + seq_len]
                    if open_len + len(piece) > seq_len:
                        emit(rows, open_toks, open_ids, open_len)
                        open_toks, open_ids, open_len = [], [], 0
                    open_toks.append(piece)
                    open_ids.append(doc_id)
                    open_len += len(piece)
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "seq_id", "tokens", "n_tok", "n_docs", "doc_ids",
                        "fill_ratio",
                    ],
                )
        if open_len:
            rows = []
            emit(rows, open_toks, open_ids, open_len)
            yield pd.DataFrame(
                rows,
                columns=[
                    "seq_id", "tokens", "n_tok", "n_docs", "doc_ids", "fill_ratio",
                ],
            )

    return src.mapInPandas(pack_iter, PACKED_SCHEMA)


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """One-row audit of a packed corpus: sequences, tokens, mean fill, and
    the padding waste a dataloader would add to reach seq_len."""
    return packed.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("fill_ratio"), 4).alias("mean_fill"),
        F.sum(F.lit(seq_len) - F.col("n_tok")).alias("pad_tokens"),
    )
