"""One-pass profiler (operators/profiling.py): metric correctness on a
frame with nulls, and the scale contract — approx mode plans a plain
partial agg (no Expand row-multiplication), one scan either way."""

from pyspark.sql import functions as F

from rap_etl_spark.operators.profiling import profile


def _df(spark):
    rows = [
        (1, 2.5, "a"),
        (2, None, "b"),
        (3, 7.5, None),
        (4, 7.5, "a"),
        (None, 1.0, "c"),
    ]
    return spark.createDataFrame(rows, "k int, v double, s string")


def test_metrics_exact(spark):
    p = {r["column"]: r for r in profile(_df(spark), approx=False).collect()}
    assert set(p) == {"k", "v", "s"}
    k, v, s = p["k"], p["v"], p["s"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (5, 1, 4)
    assert (k["min_val"], k["max_val"], k["mean_val"]) == ("1", "4", 2.5)
    assert (v["n_nulls"], v["n_distinct"], v["mean_val"]) == (1, 3, 4.63)
    assert (s["n_nulls"], s["n_distinct"], s["mean_val"]) == (1, 3, None)
    assert (s["min_val"], s["max_val"]) == ("a", "c")


def test_approx_mode_no_expand_one_scan(spark):
    df = _df(spark)
    plan = (
        profile(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan  # HLL keeps the one-pass partial-agg shape
    exact = (
        profile(df, approx=False)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact  # exact multi-distinct costs the Expand
    # approx distincts are exact at these tiny cardinalities
    p = {r["column"]: r["n_distinct"] for r in profile(df).collect()}
    assert p == {"k": 4, "v": 3, "s": 3}


def test_column_subset(spark):
    out = profile(_df(spark), columns=["v"], approx=False).collect()
    assert [r["column"] for r in out] == ["v"]
