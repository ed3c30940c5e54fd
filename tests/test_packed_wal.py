"""Packed WAL wire format (EVENTS_SCHEMA_PACKED): the binlog tail carries
tokens as one little-endian int32 blob per row; the engine expands only the
winner set to the binding array<int32> table schema. Must converge to the
byte-identical table state as the array-format replay of the same log."""

from pyspark.sql import functions as F

from rap_etl_spark.engine import assert_equivalent, replay_log
from rap_etl_spark.functions.tokens import pack_tokens, unpack_tokens
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events, write_event_log

N_EVENTS = 4000


def test_pack_unpack_roundtrip(spark, sf_small):
    ev = synthesize_events(spark, sf_small, 500, max_tok=16).select(
        "doc_id", "lsn", "tokens"
    )
    back = unpack_tokens(pack_tokens(ev))
    diff = (
        ev.alias("a")
        .join(back.alias("b"), on=["doc_id", "lsn"])
        .filter(
            ~(
                (F.col("a.tokens").isNull() & F.col("b.tokens").isNull())
                | (F.col("a.tokens") == F.col("b.tokens"))
            )
        )
    )
    assert diff.count() == 0


def test_packed_log_matches_array_schema(spark, sf_small):
    packed = synthesize_events(spark, sf_small, 1000, max_tok=16, packed=True)
    assert "tokens_bin" in packed.columns and "tokens" not in packed.columns
    arr = synthesize_events(spark, sf_small, 1000, max_tok=16)
    # same events, same payload bytes: packing the array log reproduces it
    repacked = pack_tokens(arr).select("doc_id", "lsn", "tokens_bin")
    j = packed.select("doc_id", "lsn", "tokens_bin").alias("p").join(
        repacked.alias("r"), on=["doc_id", "lsn"]
    )
    bad = j.filter(
        ~(
            (F.col("p.tokens_bin").isNull() & F.col("r.tokens_bin").isNull())
            | (F.col("p.tokens_bin") == F.col("r.tokens_bin"))
        )
    )
    assert bad.count() == 0


def test_packed_replay_converges_to_array_replay(spark, sf_small, tmp_path):
    for fmt, packed in (("arr", False), ("bin", True)):
        ev = synthesize_events(spark, sf_small, N_EVENTS, max_tok=16, packed=packed)
        write_event_log(ev, str(tmp_path / f"log-{fmt}"), n_batches=3, n_events=N_EVENTS)
    t_arr = ManifestParquetTable.create(
        spark, str(tmp_path / "t-arr"), DOCS_SCHEMA, n_buckets=8
    )
    t_bin = ManifestParquetTable.create(
        spark, str(tmp_path / "t-bin"), DOCS_SCHEMA, n_buckets=8
    )
    replay_log(spark, t_arr, str(tmp_path / "log-arr"))
    replay_log(spark, t_bin, str(tmp_path / "log-bin"))
    assert t_bin.read().schema == t_arr.read().schema  # binding array<int32> shape
    assert_equivalent(t_arr.read(), t_bin.read())


def test_packed_events_into_evolved_table(spark, sf_small, tmp_path):
    """Schema evolution x packed WAL: after widening to V2 (int64 tokens,
    +lang), int32 packed events still apply — unpacked arrays upcast at
    write, missing lang lands NULL, pre-evolution rows stay readable."""
    from rap_etl_spark.schemas import DOCS_SCHEMA_V2

    ev = synthesize_events(spark, sf_small, 1500, max_tok=8, packed=True)
    write_event_log(ev, str(tmp_path / "log"), n_batches=2, n_events=1500)
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8
    )
    from rap_etl_spark.engine import CdcEngine

    eng = CdcEngine(spark, t, count_input=False)
    eng.apply_batch(spark.read.parquet(str(tmp_path / "log/batch=0")), batch_id=0)
    t.evolve(DOCS_SCHEMA_V2)
    eng.apply_batch(spark.read.parquet(str(tmp_path / "log/batch=1")), batch_id=1)

    out = t.read()
    fields = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert fields["tokens"] == "array<bigint>" and fields["n_tok"] == "bigint"
    assert out.filter(F.col("lang").isNotNull()).count() == 0  # packed v1 has no lang
    # final state equals the array-format oracle (tokens upcast)
    from .oracle import assert_frames_equal, naive_final_state

    arr = synthesize_events(spark, sf_small, 1500, max_tok=8)
    want = naive_final_state(arr.toPandas())
    got = out.select("doc_id", "tokens", "n_tok", "source").toPandas()
    got["n_tok"] = got["n_tok"].astype("int64")
    assert_frames_equal(got, want)
