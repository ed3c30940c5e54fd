"""One-pass table profiling: per-column quality stats (rows, nulls,
distincts, min/max, numeric mean) in a SINGLE scan of the table.

Scale design: all per-column metrics are expressions in ONE global
aggregate, so partial aggregation (map-side combine) reduces each scan
task to a single row before any shuffle — profiling a 100-TB table moves
O(tasks) rows, not O(rows). The wide single-row result is pivoted to
long format (one row per column) driver-free with a literal
inline/explode over the column list (bounded by the schema width).

Distinct counts: exact `count(distinct)` over many columns makes Catalyst
plan an Expand (row multiplication x n_cols before the shuffle) — correct
but the scan's output grows with the column count. At corpus scale pass
``approx=True`` (default): HyperLogLog++ `approx_count_distinct` keeps the
plan a plain one-pass partial agg with fixed-size sketch state. The exact
mode exists for the DuckDB oracle and small audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = True,
    ndigits: int = 2,
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_val, max_val, mean_val).

    min/max are stringified (numerics rounded to `ndigits` first) so one
    schema covers heterogeneous columns; mean_val is NULL for non-numerics.
    """
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    distinct = (
        F.approx_count_distinct if approx else F.count_distinct
    )

    def stringify(c: str, agg):
        e = agg(F.col(c))
        if c in numeric:
            e = F.round(e, ndigits)
        return e.cast("string")

    aggs = []
    for c in cols:
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_nulls"),
                distinct(F.col(c)).cast("long").alias("n_distinct"),
                stringify(c, F.min).alias("min_val"),
                stringify(c, F.max).alias("max_val"),
                (
                    F.round(F.avg(F.col(c)), ndigits)
                    if c in numeric
                    else F.lit(None).cast("double")
                ).alias("mean_val"),
            ).alias(f"_{c}")
        )
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(F.array(*[F.col(f"_{c}") for c in cols])).alias("p")
    ).select("p.*")
