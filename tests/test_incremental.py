"""Incremental aggregate maintenance (operators/incremental.py): signed
delta folding must equal recomputation, including group birth/death."""

from pyspark.sql import functions as F

from rap_etl_spark.operators.incremental import agg_delta, apply_agg_delta, maintain


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "grp int, val long, _change_type string"
    )


def _agg(spark, rows):
    return spark.createDataFrame(rows, "grp int, n long, val long")


def test_delta_signs(spark):
    ch = _changes(
        spark,
        [
            (1, 10, "insert"),
            (1, 3, "update_preimage"),
            (1, 7, "update_postimage"),
            (2, 5, "delete"),
        ],
    )
    d = {r["grp"]: r for r in agg_delta(ch, ["grp"], ["val"]).collect()}
    assert d[1]["_dn"] == 1 and d[1]["val"] == 14  # +10 -3 +7
    assert d[2]["_dn"] == -1 and d[2]["val"] == -5


def test_group_birth_and_death(spark):
    base = _agg(spark, [(1, 2, 100), (2, 1, 5)])
    ch = _changes(
        spark,
        [
            (2, 5, "delete"),      # group 2 dies (n -> 0)
            (3, 9, "insert"),      # group 3 born
        ],
    )
    out = {r["grp"]: r for r in maintain(base, ch, ["grp"], ["val"]).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n"] == 2 and out[1]["val"] == 100  # untouched survives
    assert out[3]["n"] == 1 and out[3]["val"] == 9


def test_null_group_key(spark):
    base = _agg(spark, [(None, 1, 4)])
    ch = _changes(spark, [(None, 6, "insert")])
    out = maintain(base, ch, ["grp"], ["val"]).collect()
    assert len(out) == 1
    assert out[0]["n"] == 2 and out[0]["val"] == 10  # eqNullSafe join matched


def test_matches_recomputation(spark):
    rows = [(i % 4, i, "insert") for i in range(40)]
    ch1 = _changes(spark, rows[:25])
    ch2 = _changes(spark, rows[25:])
    empty = _agg(spark, [])
    a1 = maintain(empty, ch1, ["grp"], ["val"])
    a2 = maintain(a1, ch2, ["grp"], ["val"])
    full = (
        _changes(spark, rows)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("val"))
    )
    assert sorted(map(tuple, a2.collect())) == sorted(map(tuple, full.collect()))
