"""Z-order (Morton) clustering keys — multi-dimensional data layout.

Sorting a table by a single column gives perfect min/max data skipping on
that column and none on any other. Interleaving the bits of TWO columns
into one Z-order key and sorting by it keeps rows that are close in
EITHER dimension physically close, so parquet row-group / file min-max
statistics prune scans for predicates on both columns — the standard
layout trick behind Delta/Iceberg OPTIMIZE ZORDER, usable here with the
lake's sorted compaction (`compact(sort_cols=...)`) by materializing the
key as a column first.

Pure JVM bit expressions (shiftright / AND / shiftleft / OR) — the whole
key is one codegen'd expression, no UDF. `zorder_sql` emits the identical
computation in ANSI/DuckDB SQL from the same bit loop, so the operator is
value-oracle-able by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(col_a, col_b, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative integer columns
    into a Morton key (col_a at even positions, col_b at odd). Values must
    fit in `bits` bits — quantize wider domains first (e.g. pmod or a
    width_bucket); higher bits are deliberately dropped."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """The same interleave as `zorder_key`, as a SQL expression string."""
    terms = []
    for i in range(bits):
        terms.append(f"((({col_a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({col_b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
