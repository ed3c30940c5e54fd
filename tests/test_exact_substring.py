"""Exact-substring duplicate detection (neardup.exact_window_pairs)."""

from pyspark.sql import functions as F

from rap_etl_spark.operators.neardup import exact_window_pairs


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["a"], r["b"]) for r in exact_window_pairs(df, **kw).collect()
    }


BASE = "the quick brown fox jumps over the lazy dog again and again and again"


def test_verbatim_and_prefix_copies_pair(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # byte-identical
        (3, BASE + " with an appended editorial note"),  # shared prefix
        (4, "a completely different sentence that shares no forty char span x"),
    ]
    got = _pairs(spark, rows, window=40, stride=16)
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p for p in got)


def test_short_docs_emit_nothing(spark):
    got = _pairs(spark, [(1, "short"), (2, "short")], window=40, stride=16)
    assert got == set()


def test_stride_misalignment_is_the_documented_miss(spark):
    # copy shifted by 7 chars: no strided window aligns -> no pair at
    # stride 16, found at stride 1 (the recall/cost dial)
    rows = [(1, BASE), (2, "0123456" + BASE)]
    assert _pairs(spark, rows, window=40, stride=16) == set()
    assert _pairs(spark, rows, window=40, stride=1) == {(1, 2)}


def test_oversized_window_bucket_dropped(spark):
    # the same boilerplate in 9 docs with max_docs_per_window=8: the
    # shared window is a stop-fingerprint, no O(n^2) pair explosion;
    # raising the cap restores the pairs
    rows = [(i, BASE) for i in range(9)]
    assert _pairs(spark, rows, window=40, stride=16) == set()
    wide = _pairs(spark, rows, window=40, stride=16, max_docs_per_window=16)
    assert len(wide) == 36  # 9 choose 2
