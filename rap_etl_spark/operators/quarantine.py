"""Dead-letter quarantine for malformed change events (X89).

A production CDC tail cannot assume the upstream WAL is clean: connector
bugs, torn reads, and schema drift deliver events with unknown op codes,
null keys, non-monotone LSNs, or corrupt packed-token blobs. The standard
connector contract (Debezium/DLT "expectations") is: classify each event
JVM-side, let valid rows flow to the merge unchanged, and divert invalid
rows to a dead-letter location WITH the reason, idempotently per batch —
never stop ingest, never silently drop.

Scale design: the classifier is a pure Catalyst expression, so on a clean
batch it folds into the existing scan → LWW → staging codegen pipeline and
costs zero extra jobs — the engine detects "any bad rows?" via a
``df.observe`` counter on the same pass (the X66 hint-fold trick). Only a
dirty batch pays one extra column-pruned pass to write the (tiny) bad-row
set. At 100 TB that is the difference between "validation is free" and
"validation doubles the scan".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: classification order is part of the contract: reasons are joined in
#: this order so a row failing several checks has a deterministic label.
VALID_OPS = ("I", "U", "D")

REASON_COL = "_q_reason"


def quarantine_reason(events: DataFrame, key: str = "doc_id") -> Column:
    """A string column: comma-joined failure reasons, NULL when valid.

    Checks (schema-aware — payload checks apply only when the column
    exists in ``events``):

    - ``bad_op``        op is NULL or not one of I/U/D
    - ``null_key``      key column is NULL or empty
    - ``bad_lsn``       lsn is NULL or negative
    - ``torn_blob``     packed wire format: tokens_bin length not a
                        multiple of 4 (a torn/truncated int32 blob)
    - ``ntok_mismatch`` declared n_tok disagrees with the actual token
                        payload length (array or packed form)

    All checks are built-in Catalyst expressions — no Python in the hot
    path — so the classifier participates in whole-stage codegen.
    """
    cols = set(events.columns)
    checks: list[Column] = [
        F.when(F.col("op").isNull() | ~F.col("op").isin(*VALID_OPS), F.lit("bad_op")),
        F.when(
            F.col(key).isNull() | (F.col(key) == F.lit("")), F.lit("null_key")
        ),
        F.when(F.col("lsn").isNull() | (F.col("lsn") < 0), F.lit("bad_lsn")),
    ]
    if "tokens_bin" in cols:
        checks.append(
            F.when(
                F.col("tokens_bin").isNotNull()
                & (F.length("tokens_bin") % 4 != 0),
                F.lit("torn_blob"),
            )
        )
    if "n_tok" in cols and "tokens" in cols:
        checks.append(
            F.when(
                F.col("tokens").isNotNull()
                & F.col("n_tok").isNotNull()
                & (F.size("tokens") != F.col("n_tok")),
                F.lit("ntok_mismatch"),
            )
        )
    elif "n_tok" in cols and "tokens_bin" in cols:
        checks.append(
            F.when(
                F.col("tokens_bin").isNotNull()
                & F.col("n_tok").isNotNull()
                & (F.length("tokens_bin") % 4 == 0)
                & (F.length("tokens_bin") / 4 != F.col("n_tok")),
                F.lit("ntok_mismatch"),
            )
        )
    reasons = F.array_compact(F.array(*checks))
    return F.when(F.size(reasons) > 0, F.array_join(reasons, ",")).otherwise(
        F.lit(None).cast("string")
    )


def write_quarantine(bad: DataFrame, quarantine_dir: str, batch_id: int) -> str:
    """Persist the bad-row set (with its reason column) under
    ``<quarantine_dir>/batch=<id>/``, overwrite mode — a redelivered batch
    rewrites the identical dead letters, keeping the DLQ exactly-once per
    batch just like the lineage dir (engine._write_lineage)."""
    import os

    path = os.path.join(quarantine_dir, f"batch={batch_id}")
    bad.write.mode("overwrite").parquet(path)
    return path


def read_quarantine(spark: SparkSession, quarantine_dir: str) -> DataFrame:
    """All dead letters across batches; the ``batch=N`` layout comes back
    as a recovered ``batch`` partition column for free."""
    return spark.read.option("basePath", quarantine_dir).parquet(
        quarantine_dir + "/batch=*"
    )
