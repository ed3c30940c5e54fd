#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row-count + column names + order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [keys...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(canon_val(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "tolist"):  # numpy
        t = v.tolist()
        return canon_val(t)
    return v


def canon_rows(df):
    """pandas DataFrame -> sorted tuple-of-tuples with name-sorted columns."""
    cols = sorted(df.columns)
    rows = [
        tuple(canon_val(r[c]) for c in cols)
        for _, r in df[cols].iterrows()
    ]
    return cols, sorted(rows, key=lambda t: tuple(str(x) for x in t))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from rap_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:140]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (rows-only check)")
            n_rows_only += 1
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:140]}")
            n_bad += 1
            continue
        gc, gr = canon_rows(got)
        wc, wr = canon_rows(want)
        if gc != wc:
            print(f"FAIL  {name}: columns differ: spark={gc} duckdb={wc}")
            n_bad += 1
        elif len(gr) != len(wr):
            print(f"FAIL  {name}: row counts differ: spark={len(gr)} duckdb={len(wr)}")
            n_bad += 1
        elif gr != wr:
            diffs = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs (spark vs duckdb): {diffs}")
            n_bad += 1
        else:
            print(f"ok    {name}: {len(gr)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rows_only} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
