"""File sources and sinks (S1-S5): parquet/CSV/JSON readers with explicit
schemas (schema inference is a full extra pass at scale — never default to
it), and an atomic append/overwrite sink.

The reference ingests external API payloads (XML/JSON per record); here the
generalized sources are columnar files and JSON event payloads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with an explicit schema — inference would scan the data twice."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json_lines(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def parse_json_events(df: DataFrame, col: str, schema: str) -> DataFrame:
    """S3: embedded-JSON payload parsing (events.props style) via from_json —
    JVM-side Jackson, no Python."""
    return df.withColumn("_parsed", F.from_json(F.col(col), schema)).select(
        "*", "_parsed.*"
    ).drop("_parsed")


def write_parquet_atomic(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: write to a staging dir then atomically rename into place, so
    readers never observe a half-written directory (same protocol as the
    lake table's manifest swap, for plain non-tabular outputs)."""
    staging = path.rstrip("/") + "._staging"
    df.write.mode("overwrite").parquet(staging)
    if os.path.exists(path):
        if mode == "overwrite":
            import shutil

            old = path.rstrip("/") + "._old"
            os.rename(path, old)
            os.rename(staging, path)
            shutil.rmtree(old, ignore_errors=True)
            return
        raise FileExistsError(path)
    os.rename(staging, path)
