"""M2: skew handling — hot-key detection, salted repartition balance,
salted join correctness, salted LWW equivalence on a Zipf-hot log."""

from pyspark.sql import functions as F

from rap_etl_spark.operators.cdc import lww_latest, lww_latest_salted
from rap_etl_spark.operators.skew import detect_hot_keys, salt_skew, salted_join
from rap_etl_spark.sources.synth import synthesize_events


def test_detect_hot_keys(spark, sf_small):
    ev = synthesize_events(spark, sf_small, 5000, max_tok=4, dup_frac=0)
    hot = detect_hot_keys(ev, "doc_id", threshold_frac=0.01, sample_frac=None)
    assert hot.count() >= 1  # Zipf(1.2): the head keys dominate
    top = hot.orderBy(F.desc("est_count")).first()
    assert top["est_count"] > 50


def test_salt_spreads_hot_key(spark, sf_small):
    ev = synthesize_events(spark, sf_small, 5000, max_tok=4, dup_frac=0)
    hot = detect_hot_keys(ev, "doc_id", threshold_frac=0.01, sample_frac=None)
    salted = salt_skew(ev, "doc_id", buckets=8, hot_keys=hot)
    hottest = hot.orderBy(F.desc("est_count")).first()["doc_id"]
    n_salts = (
        salted.filter(F.col("doc_id") == hottest)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts > 1  # hot key spread over multiple salt buckets
    cold_sample = (
        salted.join(hot.select("doc_id"), "doc_id", "left_anti")
        .select("_salt")
        .distinct()
        .collect()
    )
    assert {r["_salt"] for r in cold_sample} == {0}  # cold keys unsalted


def test_salted_join_matches_plain_join(spark, sf_small):
    ev = synthesize_events(spark, sf_small, 4000, max_tok=4, dup_frac=0)
    dims = (
        ev.select("doc_id").distinct().withColumn("tag", F.xxhash64("doc_id"))
    )
    plain = ev.join(dims, "doc_id").select("doc_id", "lsn", "tag")
    salted = salted_join(ev, dims, "doc_id", buckets=4).select(
        "doc_id", "lsn", "tag"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_lww_on_zipf_log(spark, sf_small):
    ev = synthesize_events(spark, sf_small, 8000, max_tok=4)
    a = lww_latest(ev).select("doc_id", "lsn")
    b = lww_latest_salted(ev, salt_buckets=8).select("doc_id", "lsn")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
