"""Pin the two deliberate driver-side sample collects to their documented
caps (round-3 verdict item 7).

`fit_lang_id` (operators/text.py) and `ivf_assign`'s centroid fit
(operators/similarity.py) are the only operators that pull corpus rows to
the driver by design — both model fits need a bounded sample no matter how
large the table is. These tests make the bound load-bearing: a future edit
that drops the `.limit(cap)` (turning the collect into O(corpus) and an
OOM at 100 TB) fails here on a table larger than the cap, and a default
silently raised past the documented ceiling fails the signature pin.
"""

from __future__ import annotations

import inspect

from pyspark.sql import functions as F

try:
    # Spark 4.x: pyspark.sql.DataFrame is a dispatch facade; the concrete
    # class (whose toPandas the operators actually call) lives in classic
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - Spark 3.x layout
    from pyspark.sql import DataFrame

from rap_etl_spark.operators.similarity import ivf_assign
from rap_etl_spark.operators.text import fit_lang_id


def _spy_topandas(monkeypatch, sizes: list[int]) -> None:
    orig = DataFrame.toPandas

    def spy(self):
        pdf = orig(self)
        sizes.append(len(pdf))
        return pdf

    monkeypatch.setattr(DataFrame, "toPandas", spy)


def test_lang_id_fit_collect_is_capped(spark, monkeypatch):
    sizes: list[int] = []
    _spy_topandas(monkeypatch, sizes)
    big = spark.range(30_000).select(
        F.concat(F.lit("word"), (F.col("id") % 7).cast("string"), F.lit(" alpha beta"))
        .alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    model = fit_lang_id(big, sample_frac=1.0, max_rows=1_000)
    assert set(model) == {"en", "fr"}
    assert sizes, "fit_lang_id no longer samples via toPandas — re-pin the cap"
    assert max(sizes) <= 1_000


def test_ivf_fit_collect_is_capped(spark, monkeypatch):
    sizes: list[int] = []
    _spy_topandas(monkeypatch, sizes)
    vecs = spark.range(20_000).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 13).cast("float"), (F.col("id") % 7).cast("float")
        ).alias("embedding"),
    )
    assigned, cent = ivf_assign(
        vecs, vec_col="embedding", n_centroids=4, sample_frac=1.0,
        max_sample=500, iters=2,
    )
    assert assigned.count() == 20_000  # every row still assigned distributed-side
    assert len(cent) <= 4
    assert sizes, "ivf_assign no longer samples via toPandas — re-pin the cap"
    assert max(sizes) <= 500


def test_sample_cap_defaults_pinned():
    """The documented ceilings themselves: a silent default raise fails."""
    assert (
        inspect.signature(fit_lang_id).parameters["max_rows"].default <= 20_000
    )
    assert (
        inspect.signature(ivf_assign).parameters["max_sample"].default
        <= 100_000
    )
