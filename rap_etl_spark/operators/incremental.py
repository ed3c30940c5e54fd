"""Incremental aggregate maintenance (IVM) over CDC change streams.

The consumer side of `lake.table_changes`: maintain a distributive
aggregate (COUNT / SUM / signed derivations) of a lake table WITHOUT
re-scanning it, by folding the row-level change stream into the aggregate
state. Classic delta-propagation for distributive aggregates: every change
row carries a sign (+1 for insert/update_postimage, -1 for
delete/update_preimage), so

    agg(S')  =  agg(S)  ⊕  agg_signed(ΔS)

holds exactly for counts and sums (use fixed-point/integer columns for
exactness — the operator does not reorder FP additions for you).

Scale design: `agg_delta` is ONE map-side-combinable groupBy over the
(bucket-pruned) change stream, sized to the batch, not the table;
`apply_agg_delta` is one equi-join on the group key between the current
aggregate (|groups| rows) and the delta (|touched groups| rows) — at
10^10-event scale the maintained aggregate never re-reads the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# change types emitted by lake.table_changes
_POS = ("insert", "update_postimage")
_NEG = ("delete", "update_preimage")

def _sign():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.when(F.col("_change_type").isin(*_POS), F.lit(1))
        .when(F.col("_change_type").isin(*_NEG), F.lit(-1))
        .otherwise(F.lit(0))
    )


def agg_delta(
    changes: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Per-group signed deltas from a change stream: `_dn` (row-count
    delta) plus one signed-sum delta per sum_col. One shuffle, sized to
    the batch; HashAggregate with map-side combine."""
    sign = _sign()
    aggs = [F.sum(sign).alias("_dn")] + [
        F.sum(sign * F.col(c)).alias(c) for c in sum_cols
    ]
    return changes.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    current: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Fold a signed delta into the current aggregate state. `current`
    carries group_cols + count_col + sum_cols; groups whose maintained
    count reaches 0 are dropped (the group no longer exists in the base
    table). Full-outer join on the group key admits brand-new groups."""
    cur = current.alias("cur")
    d = delta.alias("d")
    cond = [cur[c].eqNullSafe(d[c]) for c in group_cols]
    n_new = F.coalesce(cur[count_col], F.lit(0)) + F.coalesce(d["_dn"], F.lit(0))
    out_cols = [
        F.coalesce(cur[c], d[c]).alias(c) for c in group_cols
    ] + [n_new.alias(count_col)] + [
        (F.coalesce(cur[c], F.lit(0)) + F.coalesce(d[c], F.lit(0))).alias(c)
        for c in sum_cols
    ]
    return cur.join(d, cond, "full_outer").select(*out_cols).filter(
        F.col(count_col) > 0
    )


def maintain(
    base_agg: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Convenience: base aggregate + one change batch -> next aggregate."""
    return apply_agg_delta(
        base_agg,
        agg_delta(changes, group_cols, sum_cols),
        group_cols,
        sum_cols,
        count_col,
    )
