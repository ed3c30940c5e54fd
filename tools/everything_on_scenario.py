"""Everything-on cross-feature scenario, runnable under ANY Spark master.

tests/test_everything_on.py drives this feature stack in-process; this
module is the SUBMITTABLE twin for tests/test_everything_on_cluster.py,
which runs it once under ``local-cluster[2,2,...]`` — two separate
executor JVMs receiving the engine only via ``--py-files`` — so the
cross-feature interaction class (auto schema evolution + dead-letter
quarantine + incremental MV refresh + outbound publish/downstream sync +
bloom lookups + requeue + in-line maintenance, all in one 6-batch replay)
is also proven across real executor process boundaries, where closure
serialization, Arrow worker startup, and python-worker module resolution
behave differently than in local mode.

Self-contained on purpose: no imports from tests/ (the oracle helpers
don't ship in the py-files zip). Correctness-vs-oracle is the in-process
gate's job; THIS gate asserts the cross-feature invariants that hold by
construction (exact quarantine counts, MV == recomputed definition,
feed-only downstream convergence, lookup/fsck/redelivery/layout bounds).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

N = 3000
CUT = 1500  # lsn at which the upstream schema evolves (V1 -> V2)
EDGES = [0, 500, 1000, CUT, 2000, 2500, N + 1]
PAYLOAD_COLS = ["tokens", "n_tok", "source", "lang"]


def _corrupt(batch, with_ntok_lie):
    one = batch.orderBy("doc_id", "lsn").limit(1)
    bad = [
        one.withColumn("op", F.lit("X")),
        one.withColumn("doc_id", F.lit(None).cast("string")),
        one.withColumn("lsn", F.lit(-7).cast(dict(batch.dtypes)["lsn"])),
    ]
    if with_ntok_lie:
        bad.append(
            one.withColumn(
                "n_tok",
                (F.col("n_tok") + F.lit(5)).cast(dict(batch.dtypes)["n_tok"]),
            )
        )
    out = batch
    for b in bad:
        out = out.unionByName(b)
    return out, len(bad)


def run_scenario(spark, sf_small: str, work: str) -> dict:
    """6-batch MoR replay with every production feature on; raises
    AssertionError on any violated invariant, returns a summary dict."""
    from rap_etl_spark.engine import (
        CdcEngine,
        assert_equivalent,
        requeue_quarantine,
    )
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.mv import MaterializedView
    from rap_etl_spark.publish import publish_changes
    from rap_etl_spark.schemas import DOCS_SCHEMA
    from rap_etl_spark.sources.synth import synthesize_events

    v1 = synthesize_events(spark, sf_small, N, max_tok=8)
    v2 = synthesize_events(spark, sf_small, N, max_tok=8, evolve_at_lsn=CUT)
    batches = []
    for i in range(6):
        src = v1 if EDGES[i + 1] <= CUT else v2
        batches.append(
            src.filter(
                (F.col("lsn") >= EDGES[i]) & (F.col("lsn") < EDGES[i + 1])
            )
        )

    qdir = os.path.join(work, "dlq")
    feed = os.path.join(work, "feed")
    t = ManifestParquetTable.create(
        spark, os.path.join(work, "t"), DOCS_SCHEMA, n_buckets=8
    )
    t.set_merge_mode("mor")
    eng = CdcEngine(
        spark,
        t,
        lineage_dir=os.path.join(work, "lineage"),
        auto_evolve=True,
        quarantine_dir=qdir,
        auto_materialize_depth=2,
    )

    mv = None
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
                os.path.join(work, "mv"),
                t,
                {"kind": "agg", "group_cols": ["source"], "sum_cols": ["n_tok"]},
            )
        else:
            assert not mv.refresh().skipped

    # incrementally-maintained MV == its definition recomputed on final base
    mv_got = {tuple(r) for r in mv.read().collect()}
    mv_want = {
        tuple(r)
        for r in t.read()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("n_tok"))
        .collect()
    }
    assert mv_got == mv_want, (mv_got, mv_want)

    # requeue repairs the declared-length lie; repaired rows duplicate an
    # already-applied (doc_id, lsn) so state must be UNCHANGED
    n_before = t.read().count()
    m_rq = requeue_quarantine(
        spark, eng, qdir, batch_id=100, fixes={"n_tok": "size(tokens)"}
    )
    assert m_rq is not None and m_rq.applied_rows >= 1
    assert t.read().count() == n_before
    assert requeue_quarantine(spark, eng, qdir, batch_id=101) is None

    # downstream consumer replaying ONLY the published feed converges
    ds = ManifestParquetTable.create(
        spark, os.path.join(work, "ds"), DOCS_SCHEMA, n_buckets=4
    )
    ds_eng = CdcEngine(spark, ds, auto_evolve=True)
    for bid in range(6):
        ds_eng.apply_batch(
            spark.read.parquet(os.path.join(feed, f"batch={bid}")),
            batch_id=bid,
        )
    assert_equivalent(t.read(), ds.read(), payload_cols=PAYLOAD_COLS)

    # bloom sidecars: point lookups return exactly the asked-for keys
    t.build_key_blooms()
    keys = [
        r["doc_id"]
        for r in t.read().select("doc_id").orderBy("doc_id").limit(3).collect()
    ]
    assert {r["doc_id"] for r in t.lookup(keys).collect()} == set(keys)

    rep = t.fsck()
    assert rep["ok"], rep
    assert eng.apply_batch(batches[2], batch_id=2).skipped  # redelivery
    depth = t.delta_depth()
    assert max(depth.values(), default=0) <= 2  # maintenance bounded

    return {
        "ok": True,
        "rows": n_before,
        "quarantined": sum(n_bad.values()),
        "execs": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }
