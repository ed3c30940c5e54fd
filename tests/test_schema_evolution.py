"""M3: schema evolution mid-stream — added column + int32->int64 widening
(BASELINE.json north_star). The log switches schema at a cut-over LSN; the
engine evolves the table, upcasts in-flight events, and old rows stay
readable with NULL lang."""

from pyspark.sql import functions as F

from rap_etl_spark.engine import CdcEngine
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA, DOCS_SCHEMA_V2
from rap_etl_spark.sources.synth import synthesize_events

from .oracle import assert_frames_equal, naive_final_state

N = 3000
CUT = 1500


def test_mid_stream_evolution(spark, sf_small, tmp_path):
    # phase 1: v1 events (lsn < CUT); phase 2: v2 events (lsn >= CUT) with
    # lang column + int64 tokens
    ev_v1 = synthesize_events(spark, sf_small, N, max_tok=8).filter(
        F.col("lsn") < CUT
    )
    ev_v2 = synthesize_events(
        spark, sf_small, N, max_tok=8, evolve_at_lsn=CUT
    ).filter(F.col("lsn") >= CUT)

    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    engine = CdcEngine(spark, t)
    engine.apply_batch(ev_v1, batch_id=0)

    # schema drift arrives: evolve the table, then apply the v2 batch
    t.evolve(DOCS_SCHEMA_V2)
    engine.apply_batch(ev_v2, batch_id=1)

    got = t.read()
    assert dict(got.dtypes)["tokens"] == "array<bigint>"
    assert dict(got.dtypes)["n_tok"] == "bigint"
    assert "lang" in got.columns

    # oracle over the union of both phases (v1 upcast, lang null)
    both = ev_v1.withColumn("lang", F.lit(None).cast("string")).select(
        "op", "doc_id", "lsn",
        F.col("tokens").cast("array<bigint>").alias("tokens"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        "source", "lang", "ingest_ts",
    ).unionByName(ev_v2.select(
        "op", "doc_id", "lsn", "tokens", "n_tok", "source", "lang", "ingest_ts"
    ))
    want = naive_final_state(both.toPandas())
    assert_frames_equal(got.select("doc_id", "tokens", "n_tok", "source", "lang").toPandas(), want)

    # keys never touched after the cut-over keep NULL lang, updated keys have it
    assert got.filter(F.col("lang").isNull()).count() > 0
    assert got.filter(F.col("lang").isNotNull()).count() > 0


def test_upcast_on_read_only_old_files(spark, sf_small, tmp_path):
    ev_v1 = synthesize_events(spark, sf_small, 500, max_tok=8)
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4)
    CdcEngine(spark, t).apply_batch(ev_v1, batch_id=0)
    t.evolve(DOCS_SCHEMA_V2)
    # all files are v1; read through the v2 schema must still work
    got = t.read()
    assert got.count() > 0
    row = got.first()
    assert row["lang"] is None
    assert isinstance(row["n_tok"], int)
