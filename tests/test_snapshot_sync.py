"""Full-snapshot reconciliation (operators/cdc.py snapshot_diff /
snapshot_changes) — the generalization of the reference's add/remove
publishing model (SURVEY.md §1.1): a snapshot asserts COMPLETE truth, so
sync must add snapshot-only keys, remove table-only keys, re-publish
changed payloads, and write NOTHING for unchanged rows (empty-diff
idempotency, lifted from per-record to whole-table)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.operators.cdc import snapshot_changes, snapshot_diff

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("bal", T.DoubleType()),
        T.StructField("seg", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_diff_classifies_all_four_actions(spark):
    table = _df(
        spark,
        [("a", 1.0, "x"), ("b", 2.0, "y"), ("gone", 9.0, "z")],
    )
    snap = _df(
        spark,
        [("a", 1.0, "x"), ("b", 5.0, "y"), ("new", 3.0, "w")],
    )
    got = {
        r["doc_id"]: r["action"]
        for r in snapshot_diff(snap, table, ["bal", "seg"]).collect()
    }
    assert got == {"a": "N", "b": "U", "gone": "D", "new": "I"}


def test_d_rows_carry_null_payload_and_key(spark):
    table = _df(spark, [("gone", 9.0, "z")])
    snap = _df(spark, [])
    row = snapshot_diff(snap, table, ["bal", "seg"]).collect()[0]
    assert row["doc_id"] == "gone" and row["action"] == "D"
    assert row["bal"] is None and row["seg"] is None


def test_sync_converges_then_resync_is_empty(spark, tmp_path):
    table = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4
    )
    table.append(
        _df(spark, [("a", 1.0, "x"), ("b", 2.0, "y"), ("gone", 9.0, "z")]),
        batch_id=0,
        assume_unique=True,
    )
    snap = _df(spark, [("a", 1.0, "x"), ("b", 5.0, "y"), ("new", 3.0, "w")])

    diff = snapshot_diff(snap, table.read(), ["bal", "seg"])
    table.merge(snapshot_changes(diff, sync_lsn=1), batch_id=1)

    got = sorted(
        (r["doc_id"], r["bal"], r["seg"])
        for r in table.read().select("doc_id", "bal", "seg").collect()
    )
    assert got == [("a", 1.0, "x"), ("b", 5.0, "y"), ("new", 3.0, "w")]

    # empty-diff idempotency: re-sync classifies everything N
    rediff = snapshot_diff(snap, table.read(), ["bal", "seg"])
    assert rediff.filter(F.col("action") != "N").count() == 0
    # and the resulting change set is empty — nothing to merge at all
    assert snapshot_changes(rediff, sync_lsn=2).count() == 0


def test_later_cdc_event_beats_sync_and_vice_versa(spark, tmp_path):
    """Snapshots and the WAL tail compose under ONE LWW order: a CDC event
    with lsn above the sync LSN wins; one below it loses."""
    table = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4
    )
    table.append(_df(spark, [("a", 1.0, "x")]), batch_id=0, assume_unique=True)

    snap = _df(spark, [("a", 2.0, "x")])
    diff = snapshot_diff(snap, table.read(), ["bal", "seg"])
    table.merge(snapshot_changes(diff, sync_lsn=10), batch_id=1)

    changes = spark.createDataFrame(
        [("a", 11, 3.0, "x", "U"), ("a", 9, -1.0, "x", "U")],
        "doc_id string, lsn long, bal double, seg string, op string",
    )
    table.merge(changes, batch_id=2)
    row = table.read().select("bal").collect()[0]
    assert row["bal"] == 3.0  # lsn 11 beat the sync; lsn 9 lost to it
