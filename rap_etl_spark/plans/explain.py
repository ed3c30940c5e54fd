"""Plan-shape inspection and assertions (SURVEY.md §4).

The engine's performance contract is expressed as properties of the
physical plan, not vibes: filters reach the parquet scan, projections prune
the read schema, small dims broadcast, aggregations keep fixed-width
buffers (HashAggregate, not SortAggregate), and Python appears only behind
Arrow evals. Tests assert these properties so a regression in plan shape
fails CI before it shows up in a benchmark.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_info(df: DataFrame) -> list[dict]:
    """Parse the formatted plan's parquet scans: pushed filters + read schema."""
    plan = formatted_plan(df)
    scans = []
    for block in re.split(r"\n\(\d+\) ", plan):
        if not block.startswith("Scan parquet"):
            continue
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, re.DOTALL)
        scans.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_columns": [
                    c.split(":")[0].strip()
                    for c in (schema.group(1).split(",") if schema else [])
                    if ":" in c
                ],
            }
        )
    return scans


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in s["pushed_filters"] for s in scan_info(df))


def read_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for s in scan_info(df):
        cols.update(s["read_columns"])
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges not
    counted — those are the cheap kind)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def join_kinds(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def agg_kinds(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"\(\d+\) (HashAggregate|SortAggregate|ObjectHashAggregate)", plan)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """WholeStageCodegen span count from the non-formatted plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return len(set(re.findall(r"\*\((\d+)\)", buf.getvalue())))
