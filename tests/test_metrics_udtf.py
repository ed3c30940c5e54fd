"""C10 streaming metrics listener, V6 UDTF, V5 mapInArrow, F7 map fns."""

import time

from pyspark.sql import functions as F

from rap_etl_spark.functions.udtf_demo import register
from rap_etl_spark.operators.tpch_queries import q_fn_map, q_map_in_arrow
from rap_etl_spark.sources.synth import synthesize_events
from rap_etl_spark.streaming import metrics as sm


def test_streaming_metrics_listener(spark, sf_small, tmp_path):
    ev = synthesize_events(spark, sf_small, 1000, max_tok=4)
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)
    listener = sm.attach(spark, jsonl_path=str(tmp_path / "metrics.jsonl"))
    try:
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        q = (
            stream.groupBy("op").count()
            .writeStream.format("memory")
            .queryName("metrics_out")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener delivery is async — poll briefly
        for _ in range(20):
            if listener.totals()["rows"] > 0:
                break
            time.sleep(0.5)
        totals = listener.totals()
        assert totals["batches"] >= 1
        assert totals["rows"] == spark.read.parquet(src).count()
        with open(tmp_path / "metrics.jsonl") as f:
            assert len(f.readlines()) == totals["batches"]
    finally:
        sm.detach(spark, listener)


def test_udtf_matches_native_explode(spark, sf_small):
    register(spark)
    d = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .limit(20)
        .withColumn("tokens", F.transform(F.split("text", " "), lambda w: F.length(w)))
    )
    d.createOrReplaceTempView("docs_tok")
    got = spark.sql(
        "SELECT doc_id, t.pos, t.token FROM docs_tok, "
        "LATERAL explode_tokens(tokens) t"
    )
    want = d.select("doc_id", F.posexplode("tokens").alias("pos", "token"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_map_in_arrow_matches_native(spark, sf_small):
    got = q_map_in_arrow(spark, sf_small)
    want = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", F.upper(F.element_at(F.split("text", " "), 1)).alias("first_upper"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_fn_map_values(spark, sf_small):
    rows = q_fn_map(spark, sf_small).limit(10).collect()
    d = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").limit(10).collect()
    }
    for r in rows:
        src = d[r["doc_id"]]
        assert r["m_lang"] == src["lang"]
        assert r["n_keys"] == 2
        assert r["vals"] == f"{src['lang']}|{src['source']}"
