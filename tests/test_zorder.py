"""Z-order key (functions/zorder.py): bit-exactness against a python
reference, and the layout property that justifies it — range-partitioning
by z-key bounds per-partition min/max ranges in BOTH dimensions (what
makes parquet min/max skipping work for either predicate)."""

from pyspark.sql import functions as F

from rap_etl_spark.functions.zorder import zorder_key


def _ref_morton(a: int, b: int, bits: int = 16) -> int:
    k = 0
    for i in range(bits):
        k |= ((a >> i) & 1) << (2 * i)
        k |= ((b >> i) & 1) << (2 * i + 1)
    return k


def test_zorder_matches_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1024)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key("a", "b")
    )
    for r in df.collect():
        assert r["z"] == _ref_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_layout_bounds_both_dimensions(spark):
    """Split 64k points on a 256x256 grid into 16 range partitions. Sorted
    by a single column, each partition spans the FULL domain of the other
    column; sorted by z-key, both per-partition spans collapse (quadrant
    locality)."""
    n = 256
    pts = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )

    def spans(df, key):
        parts = df.repartitionByRange(16, key).withColumn(
            "p", F.spark_partition_id()
        )
        agg = parts.groupBy("p").agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        r = agg.agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay")).first()
        return r["ax"], r["ay"]

    sx_single, sy_single = spans(pts, F.col("x"))
    z = pts.withColumn("z", zorder_key("x", "y", bits=8))
    sx_z, sy_z = spans(z, F.col("z"))
    # single-column sort: y unconstrained (span ~ full 255)
    assert sy_single > 0.9 * (n - 1)
    # z-order: BOTH dimensions bounded well below the full domain
    assert sx_z < 0.5 * (n - 1) and sy_z < 0.5 * (n - 1)
