"""Everything-on integration gate: ONE replay with every production
feature active simultaneously — auto schema evolution (X64), dead-letter
quarantine (X89), incremental materialized-view refresh (X92), outbound
CDC feed publishing + downstream sync (X87), bloom sidecar point lookups
(X93), per-batch lineage, and in-line layout maintenance (auto-compact
for CoW / auto-materialize for MoR).

Every feature here has its own focused test; this gate exists for the
CROSS-FEATURE interactions those tests can't see — the production
failure class where two individually-correct features share a batch
lifecycle and step on each other (quarantine's observe counter vs the
evolve commit, MV changefeed refresh across a mid-stream schema change,
publish reading a batch's change pair after an in-line compaction added
snapshots, maintenance rewrites invalidating bloom sidecars).

Scenario: a 6-batch CDC tail whose upstream schema evolves mid-stream
(new nullable `lang`, int32→int64 widening — the synth generator's
standard V1→V2 cut-over) and whose batches 1 and 4 each carry injected
malformed events (bad op / null key / negative lsn, + a declared-length
lie in the evolved half). Asserts, per merge mode:

  1. final table state == the naive pandas replay oracle over the CLEAN
     event stream (bad rows must not leak into state);
  2. exactly the injected rows were quarantined, with the right reasons;
  3. the MV (refreshed incrementally after every batch, across the
     schema change) equals its definition recomputed over the final base;
  4. a downstream table synced ONLY from the published feed converges to
     the identical state;
  5. bloom-sidecar point lookups return the final rows;
  6. fsck passes after the full run (maintenance included);
  7. redelivery of a mid-stream batch is a metadata-only no-op;
  8. maintenance actually bounded the layout (files/deltas per bucket).
"""

import os

import pytest
from pyspark.sql import functions as F

from rap_etl_spark.engine import CdcEngine
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.mv import MaterializedView
from rap_etl_spark.operators.quarantine import REASON_COL
from rap_etl_spark.publish import publish_changes
from rap_etl_spark.schemas import DOCS_SCHEMA
from rap_etl_spark.sources.synth import synthesize_events

from .oracle import assert_frames_equal, naive_final_state

N = 3000
CUT = 1500  # lsn at which the upstream schema evolves (V1 -> V2)
EDGES = [0, 500, 1000, CUT, 2000, 2500, N + 1]  # 6 batches, 3 per schema
FINAL_COLS = ["doc_id", "tokens", "n_tok", "source", "lang"]


def _batches(spark, sf_small):
    """The raw two-phase upstream log, split into 6 lsn-ranged batches:
    batches 0-2 in the V1 wire schema, 3-5 in V2 (as a real connector
    would deliver them)."""
    v1 = synthesize_events(spark, sf_small, N, max_tok=8)
    v2 = synthesize_events(spark, sf_small, N, max_tok=8, evolve_at_lsn=CUT)
    out = []
    for i in range(6):
        src = v1 if EDGES[i + 1] <= CUT else v2
        out.append(
            src.filter((F.col("lsn") >= EDGES[i]) & (F.col("lsn") < EDGES[i + 1]))
        )
    return out, v1, v2


def _clean_union(v1, v2):
    """The clean stream in the final (V2) schema — the oracle's input."""
    return (
        v1.filter(F.col("lsn") < CUT)
        .withColumn("lang", F.lit(None).cast("string"))
        .select(
            "op", "doc_id", "lsn",
            F.col("tokens").cast("array<bigint>").alias("tokens"),
            F.col("n_tok").cast("bigint").alias("n_tok"),
            "source", "lang", "ingest_ts",
        )
        .unionByName(
            v2.filter(F.col("lsn") >= CUT).select(
                "op", "doc_id", "lsn", "tokens", "n_tok", "source", "lang",
                "ingest_ts",
            )
        )
    )


def _corrupt(batch, with_ntok_lie: bool):
    """Append malformed copies of the batch's first rows: one bad op, one
    null key, one negative lsn (+ one declared-length lie when asked).
    unionByName keeps the wire schema identical, so these reach the
    engine exactly as a buggy connector would deliver them."""
    one = batch.orderBy("doc_id", "lsn").limit(1)
    bad = [
        one.withColumn("op", F.lit("X")),
        one.withColumn("doc_id", F.lit(None).cast("string")),
        one.withColumn("lsn", F.lit(-7).cast(dict(batch.dtypes)["lsn"])),
    ]
    if with_ntok_lie:
        bad.append(
            one.withColumn(
                "n_tok", (F.col("n_tok") + F.lit(5)).cast(dict(batch.dtypes)["n_tok"])
            )
        )
    out = batch
    for b in bad:
        out = out.unionByName(b)
    return out, len(bad)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_everything_on_replay(spark, sf_small, tmp_path, mode):
    batches, v1, v2 = _batches(spark, sf_small)
    qdir = str(tmp_path / "dlq")
    feed = str(tmp_path / "feed")
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8
    )
    if mode == "mor":
        t.set_merge_mode("mor")
    eng = CdcEngine(
        spark,
        t,
        lineage_dir=str(tmp_path / "lineage"),
        auto_evolve=True,
        quarantine_dir=qdir,
        auto_compact_files=3 if mode == "cow" else None,
        auto_materialize_depth=2 if mode == "mor" else None,
    )

    mv = None
    mv_sk = None
    n_bad = {}
    for bid, batch in enumerate(batches):
        if bid in (1, 4):
            batch, n_bad[bid] = _corrupt(batch, with_ntok_lie=(bid == 4))
        m = eng.apply_batch(batch, batch_id=bid)
        assert not m.skipped
        assert m.quarantined_rows == n_bad.get(bid, 0), (bid, m)
        pub = publish_changes(t, bid, feed)
        assert pub["published"] and "error" not in pub, pub
        if bid == 0:
            mv = MaterializedView.create(
                spark,
                str(tmp_path / "mv"),
                t,
                {"kind": "agg", "group_cols": ["source"], "sum_cols": ["n_tok"]},
            )
            mv_sk = MaterializedView.create(
                spark,
                str(tmp_path / "mv_sk"),
                t,
                {
                    "kind": "distinct_sketch",
                    "group_cols": ["source"],
                    "val_col": "n_tok",
                    "lgk": 12,
                },
            )
        else:
            info = mv.refresh()
            assert not info.skipped
            info_sk = mv_sk.refresh()
            assert not info_sk.skipped and not info_sk.full_recompute

    # 1. final state == naive oracle over the CLEAN stream (V2 schema)
    want = naive_final_state(_clean_union(v1, v2).toPandas())
    got = t.read().select(*FINAL_COLS).toPandas()
    assert_frames_equal(got, want)

    # 2. exactly the injected rows were quarantined, with reasons
    assert sum(m.quarantined_rows for m in eng.metrics) == sum(n_bad.values())
    dlq = spark.read.option("basePath", qdir).parquet(
        *[f"{qdir}/batch={b}" for b in n_bad]
    )
    reasons = sorted(r[0] for r in dlq.select(REASON_COL).collect())
    assert reasons == sorted(
        ["bad_op", "null_key", "bad_lsn"] + ["bad_op", "null_key", "bad_lsn", "ntok_mismatch"]
    ), reasons

    # 3. the incrementally-maintained MV == its definition recomputed on
    # the final base (across the mid-stream schema change)
    mv_got = mv.read().toPandas().sort_values("source").reset_index(drop=True)
    mv_want = (
        t.read()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("n_tok"))
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert list(mv_got.columns) == list(mv_want.columns)
    assert mv_got.equals(mv_want), (mv_got, mv_want)

    # 3b. the distinct-sketch MV (X102): maintained across deletes +
    # the schema change, its estimate must EQUAL exact count_distinct
    # (n_tok's domain is tiny — deep inside the lgk=12 exact regime)
    sk_got = {
        tuple(r)
        for r in mv_sk.read().select("source", "n", "est").collect()
    }
    sk_want = {
        tuple(r)
        for r in t.read()
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("n_tok").alias("est"),
        )
        .collect()
    }
    assert sk_got == sk_want

    # 3c. requeue (X103): repair the declared-length lie and re-ingest.
    # The repaired row duplicates an already-applied (doc_id, lsn) with
    # an identical payload, so the table state must be UNCHANGED (LWW
    # re-delivery convergence); the unfixable bad_op/null_key/bad_lsn
    # rows stay dead; a second requeue finds nothing.
    from rap_etl_spark.engine import requeue_quarantine

    m_rq = requeue_quarantine(
        spark, eng, qdir, batch_id=100, fixes={"n_tok": "size(tokens)"}
    )
    assert m_rq is not None and m_rq.applied_rows >= 1
    assert_frames_equal(t.read().select(*FINAL_COLS).toPandas(), want)
    assert requeue_quarantine(spark, eng, qdir, batch_id=101) is None

    # 4. a downstream consumer replaying ONLY the published feed converges
    # to the identical table state (the outbound-CDC round trip)
    ds = ManifestParquetTable.create(
        spark, str(tmp_path / "ds"), DOCS_SCHEMA, n_buckets=4
    )
    ds_eng = CdcEngine(spark, ds, auto_evolve=True)
    for bid in range(6):
        ds_eng.apply_batch(
            spark.read.parquet(f"{feed}/batch={bid}"), batch_id=bid
        )
    assert_frames_equal(ds.read().select(*FINAL_COLS).toPandas(), want)

    # 5. bloom sidecars: point lookups return the final rows
    t.build_key_blooms()
    keys = want["doc_id"].head(3).tolist()
    hit = t.lookup(keys).select(*FINAL_COLS).toPandas()
    assert_frames_equal(hit, want[want["doc_id"].isin(keys)].reset_index(drop=True))

    # 6. integrity audit after the full run, maintenance included
    rep = t.fsck()
    assert rep["ok"], rep

    # 7. redelivery of a mid-stream batch is a metadata-only no-op
    redo = eng.apply_batch(batches[2], batch_id=2)
    assert redo.skipped

    # 8. in-line maintenance bounded the layout
    if mode == "cow":
        assert max(t.files_per_bucket().values()) <= 3
    else:
        depth = t.delta_depth()
        assert max(depth.values(), default=0) <= 2

    # per-batch lineage landed for every applied batch — the 6 stream
    # batches plus the requeue commit (batch=100), which is a first-class
    # batch and must leave the same audit trail
    lineage = {d for d in os.listdir(str(tmp_path / "lineage")) if d.startswith("batch=")}
    assert lineage == {f"batch={b}" for b in range(6)} | {"batch=100"}
