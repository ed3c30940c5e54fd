"""Driver-style oracle gate inside pytest: run every oracled queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables
(sf0.001 — fast), compare row-count + column names + order-insensitive
canonical values. This is the same comparison the driver performs at sf0.01
(SURVEY.md §5.2-1); keeping it in `tests/` means a broken oracle pair fails
locally before the driver ever sees it."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon_val(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy scalar/array
        return _canon_val(v.tolist())
    return v


def _canon_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(_canon_val(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return cols, sorted(rows, key=lambda t: tuple(str(x) for x in t))


@pytest.fixture(scope="module")
def ddb(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_small, ddb, name):
    from pyspark.sql.types import ArrayType, MapType, StructType

    sdf = entrymod.queries()[name](spark, sf_small)
    # Driver-compat guard: the external driver's canonicalizer (pandas
    # sort_values + hash) dies on list/dict cells — round 2 recorded two
    # "unhashable type: 'list'" ERRs for locally-green queries. Oracled
    # outputs must be scalar columns only (serialize arrays to strings).
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} returns non-scalar columns {bad}: the driver canonicalizer "
        "cannot hash them — serialize with to_json/concat_ws"
    )
    got = sdf.toPandas()
    want = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    gc, gr = _canon_rows(got)
    wc, wr = _canon_rows(want)
    assert gc == wc, f"columns differ: spark={gc} duckdb={wc}"
    assert len(gr) == len(wr), f"row counts differ: spark={len(gr)} duckdb={len(wr)}"
    diffs = [(a, b) for a, b in zip(gr, wr) if a != b]
    assert not diffs, f"{len(diffs)} row diffs; first: {diffs[:3]}"
