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


def test_auto_evolve_mid_stream(spark, sf_small, tmp_path):
    """Round-3 X64: the same cut-over scenario as test_mid_stream_evolution
    but WITHOUT the manual t.evolve() — engine.auto_evolve absorbs the
    upstream DDL (new nullable `lang`, int->bigint widenings) before the
    merge, and the final state matches the naive replay oracle exactly."""
    ev_v1 = synthesize_events(spark, sf_small, N, max_tok=8).filter(
        F.col("lsn") < CUT
    )
    ev_v2 = synthesize_events(
        spark, sf_small, N, max_tok=8, evolve_at_lsn=CUT
    ).filter(F.col("lsn") >= CUT)

    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8
    )
    engine = CdcEngine(spark, t, auto_evolve=True)
    engine.apply_batch(ev_v1, batch_id=0)
    v_before = t._manifest()["current_schema_version"]
    engine.apply_batch(ev_v2, batch_id=1)

    got = t.read()
    assert dict(got.dtypes)["tokens"] == "array<bigint>"
    assert dict(got.dtypes)["n_tok"] == "bigint"
    assert "lang" in got.columns
    # exactly one schema commit for the whole drift (adds + widenings fold
    # into one evolve), and batch 0 (no drift) committed none
    assert v_before == 0
    assert t._manifest()["current_schema_version"] == 1

    both = ev_v1.withColumn("lang", F.lit(None).cast("string")).select(
        "op", "doc_id", "lsn",
        F.col("tokens").cast("array<bigint>").alias("tokens"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        "source", "lang", "ingest_ts",
    ).unionByName(ev_v2.select(
        "op", "doc_id", "lsn", "tokens", "n_tok", "source", "lang", "ingest_ts"
    ))
    want = naive_final_state(both.toPandas())
    assert_frames_equal(
        got.select("doc_id", "tokens", "n_tok", "source", "lang").toPandas(),
        want,
    )


def test_auto_evolve_off_drops_unknown_columns(spark, sf_small, tmp_path):
    """Default behavior unchanged: without auto_evolve an unknown event
    column is simply not part of the payload projection — schema stays at
    version 0 and the merge succeeds on the known columns."""
    ev_v2 = synthesize_events(
        spark, sf_small, 500, max_tok=8, evolve_at_lsn=0
    )
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4
    )
    CdcEngine(spark, t).apply_batch(ev_v2, batch_id=0)
    assert t._manifest()["current_schema_version"] == 0
    assert "lang" not in t.read().columns
    assert t.read().count() > 0


def test_auto_evolve_is_idempotent_per_schema(spark, sf_small, tmp_path):
    """A second drifted batch with the SAME evolved shape must not mint
    another schema version."""
    ev = synthesize_events(spark, sf_small, 1000, max_tok=8, evolve_at_lsn=0)
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4
    )
    engine = CdcEngine(spark, t, auto_evolve=True)
    engine.apply_batch(ev.filter(F.col("lsn") % 2 == 0), batch_id=0)
    assert t._manifest()["current_schema_version"] == 1
    engine.apply_batch(ev.filter(F.col("lsn") % 2 == 1), batch_id=1)
    assert t._manifest()["current_schema_version"] == 1
