"""As-of join (J7): for each left row, the most recent right row with
right.ts <= left.ts within the same key.

Spark has no native ASOF JOIN; the scalable composition is the union+window
trick — one shuffle on (key), no join explosion:

    tag rows left/right -> union -> window last_value(right payload,
    ignoreNulls) over (partition key order ts, side rows unbounded
    preceding..current) -> keep left rows.

Right rows sort BEFORE left rows at equal ts, so the match is inclusive
(right.ts == left.ts counts), matching DuckDB's ASOF `>=` semantics.
Cost: one shuffle + one sort per key partition — same as a sort-merge join,
but never materializing the per-key cross product that a naive
(join + filter + row_number) plan would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Left as-of join. Output: all left columns + right_payload columns
    (NULL when no right row at-or-before the left timestamp exists)."""
    lcols = left.columns
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in right_payload
            )
            + ">"
        )
        .alias("_r"),
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_rm", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_rm.{c}").alias(c) for c in right_payload],
    )
    return out
