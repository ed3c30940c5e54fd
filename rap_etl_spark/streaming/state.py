"""R6: continuous per-key LWW via arbitrary stateful processing.

The engine's default streaming path is foreachBatch + table-side LWW
(bounded state: the lake table itself holds the per-key version). This
module is the alternative for LOW-LATENCY consumers that want the current
winner per key pushed downstream without a table read: per-key state holds
(max lsn, payload) and emits only when the winner changes.

State sizing note (SURVEY.md §7.4-6): per-key state grows with the live key
count — fine for bounded key universes; for unbounded ones prefer the
foreachBatch path where the table, not the state store, is the keeper.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WINNER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

_STATE_SCHEMA = "lsn LONG, op STRING, n_tok INT, source STRING"


def _update_winner(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: keep the max-LSN event per
    key; emit a row only when the winner advances (change-data capture OF
    the change stream — downstream sees one row per actual state change)."""
    if state.exists:
        cur_lsn, cur_op, cur_n, cur_src = state.get
    else:
        cur_lsn, cur_op, cur_n, cur_src = -1, "", None, None
    best = (cur_lsn, cur_op, cur_n, cur_src)
    changed = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        idx = pdf["lsn"].idxmax()
        row = pdf.loc[idx]
        if int(row["lsn"]) > best[0]:
            best = (
                int(row["lsn"]),
                str(row["op"]),
                None if pd.isna(row["n_tok"]) else int(row["n_tok"]),
                None if row["source"] is None else str(row["source"]),
            )
            changed = True
    if changed:
        state.update(best)
        yield pd.DataFrame(
            {
                "doc_id": [key[0]],
                "lsn": [best[0]],
                "op": [best[1]],
                "n_tok": [best[2]],
                "source": [best[3]],
            }
        )


def stateful_lww(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Continuous LWW over a streaming change-event frame. Input must carry
    doc_id, lsn, op, n_tok, source, ingest_ts. Output: winner-change rows."""
    return (
        events.withWatermark("ingest_ts", watermark)
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update_winner,
            outputStructType=WINNER_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_lww_tws(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Spark 4.x transformWithStateInPandas form of stateful_lww — the
    successor stateful API (StatefulProcessor + typed per-key ValueState on
    the RocksDB state store, which Spark requires for this operator:
    set spark.sql.streaming.stateStore.providerClass to
    RocksDBStateStoreProvider on the session). Same semantics: emit a row
    only when a key's max-LSN winner advances.

    Environment note: pyspark's TWS wire protocol imports the `protobuf`
    Python package at query start (StateMessage_pb2); this sandbox ships
    no protobuf and forbids installs, so the in-repo test is skipped here
    and runs wherever protobuf exists (pytest gates on the import). The
    applyInPandasWithState form above is the fully-tested R6 operator."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _LwwProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "winner",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType()),
                        T.StructField("op", T.StringType()),
                        T.StructField("n_tok", T.IntegerType()),
                        T.StructField("source", T.StringType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            cur = self._state.get() if self._state.exists() else None
            best = (
                (int(cur[0]), str(cur[1]), cur[2], cur[3])
                if cur is not None
                else (-1, "", None, None)
            )
            changed = False
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                idx = pdf["lsn"].idxmax()
                row = pdf.loc[idx]
                if int(row["lsn"]) > best[0]:
                    best = (
                        int(row["lsn"]),
                        str(row["op"]),
                        None if pd.isna(row["n_tok"]) else int(row["n_tok"]),
                        None if row["source"] is None else str(row["source"]),
                    )
                    changed = True
            if changed:
                self._state.update(best)
                yield pd.DataFrame(
                    {
                        "doc_id": [key[0]],
                        "lsn": [best[0]],
                        "op": [best[1]],
                        "n_tok": [best[2]],
                        "source": [best[3]],
                    }
                )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ingest_ts", watermark)
        .groupBy("doc_id")
        .transformWithStateInPandas(
            _LwwProcessor(),
            outputStructType=WINNER_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
