"""CDC wave 8 (round 2, session 4): dimension-history and partial-update
operators — SCD Type 2, change-data-feed pre/post images, and Debezium-style
patch CDC, both as a pure fold and end-to-end through the real lake table
(``merge(update_semantics='patch')``).

All four are value-oracled against DuckDB on the star schema: the change
stream is derived deterministically from `orders` (doc_id = custkey,
lsn = orderkey — a real total order per key), exactly as `cdc_merge` does.

Scale notes: scd2/changefeed are each ONE shuffle by key (all window
functions share a single (key, lsn) Exchange+Sort); the patch fold is one
fixed-width hash aggregate with map-side combine; the end-to-end patch
merge adds NO job over a row merge — the per-column coalesce lives inside
the same single full-outer join (lake.py merge).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from rap_etl_spark.operators.relational import _t


def _order_events(spark, sf):
    """Deterministic change stream: one event per order, keyed by customer,
    versioned by orderkey (monotone per key in TPC-H generation order)."""
    return _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
    )


def q_cdc_scd2(spark, sf):
    """SCD Type 2 dimension history (Kimball): per customer, the sequence
    of (status, priority) versions with change-collapse — consecutive
    orders repeating the same attributes extend the open version instead
    of opening a new one — and [valid_from, valid_to) LSN validity ranges
    with an is_current flag."""
    from rap_etl_spark.operators.cdc import scd2_history

    ev = _order_events(spark, sf).select("doc_id", "lsn", "status", "priority")
    return scd2_history(ev, key="doc_id", lsn_col="lsn", tracked=["status", "priority"])


def q_cdc_changefeed(spark, sf):
    """Change-data-feed with pre/post images (Delta CDF wide form): the
    first event per customer is an `insert`, every later one an `update`
    carrying price_pre = the previous version's price."""
    from rap_etl_spark.operators.cdc import changefeed

    ev = _order_events(spark, sf).select("doc_id", "lsn", "price")
    return changefeed(ev, key="doc_id", lsn_col="lsn", payload_cols=["price"])


def _sparse_patches(spark, sf):
    """Partial-update stream: even orderkeys set only `bal`, odd ones only
    `seg` — every event leaves the other column NULL (= unchanged)."""
    return _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_totalprice")).alias("bal"),
        F.when(F.col("o_orderkey") % 2 == 1, F.lit("PATCHED")).alias("seg"),
    )


def q_cdc_patch(spark, sf):
    """Partial-update fold (cdc.lww_patch): per customer, the per-COLUMN
    winner — bal at the highest even orderkey, seg at the highest odd one,
    lsn = overall max — computed as one fixed-width hash aggregate."""
    from rap_etl_spark.operators.cdc import lww_patch

    return lww_patch(
        _sparse_patches(spark, sf),
        key="doc_id",
        lsn_col="lsn",
        payload_cols=["bal", "seg"],
    )


def q_cdc_merge_patch(spark, sf):
    """Patch CDC end-to-end through the REAL lake table: bootstrap from
    `customer`, fold the sparse update stream with lww_patch, then
    ``merge(update_semantics='patch')`` — columns an update left NULL must
    keep the bootstrapped value, inside the same single full-outer join a
    row merge uses. The oracle states exactly that: per-column arg_max
    fold LEFT-JOINed onto customer with coalesce."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_patch

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("bal", T.DoubleType()),
            T.StructField("seg", T.StringType()),
        ]
    )
    boot = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    work = tempfile.mkdtemp(prefix="rap-etl-cdc-patch-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.append(boot, batch_id=0, assume_unique=True)
        patch = lww_patch(
            _sparse_patches(spark, sf),
            key="doc_id",
            lsn_col="lsn",
            payload_cols=["bal", "seg"],
        ).withColumn("op", F.lit("U"))
        table.merge(patch, batch_id=1, update_semantics="patch")
        rows = table.read().select("doc_id", "bal", "seg").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_cdc_auto_evolve(spark, sf):
    """Upstream-DDL handling end-to-end (engine.auto_evolve): batch 0's
    events carry (price); batch 1 arrives with a NEW `priority` column —
    the upstream ALTER TABLE mid-stream. The engine evolves the table
    before the merge, so ingest never stops: keys whose LWW winner sits in
    batch 1 carry the new column, keys won by batch 0 read NULL through
    schema resolution. The oracle states the global LWW with the column
    present only on odd-LSN winners (batch 1 = odd orderkeys)."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine
    from rap_etl_spark.lake import ManifestParquetTable

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
        F.lit("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    out_schema = T.StructType(
        list(schema.fields) + [T.StructField("priority", T.StringType())]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-cdc-evolve-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        eng = CdcEngine(spark, table, auto_evolve=True, count_input=False)
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 0).drop("priority"), 0)
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 1), 1)
        rows = table.read().select(
            "doc_id", "lsn", "price", "priority"
        ).collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES = {
    "cdc_scd2": q_cdc_scd2,
    "cdc_changefeed": q_cdc_changefeed,
    "cdc_patch": q_cdc_patch,
    "cdc_merge_patch": q_cdc_merge_patch,
    "cdc_auto_evolve": q_cdc_auto_evolve,
}

CDC_ORACLES = {
    "cdc_scd2": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_orderstatus AS status,"
        " o_orderpriority AS priority FROM orders),"
        " keep AS (SELECT *, (lag(lsn) OVER w IS NULL"
        "   OR status IS DISTINCT FROM lag(status) OVER w"
        "   OR priority IS DISTINCT FROM lag(priority) OVER w) AS _keep"
        "  FROM ev WINDOW w AS (PARTITION BY doc_id ORDER BY lsn)),"
        " v AS (SELECT doc_id, status, priority, lsn AS valid_from"
        "  FROM keep WHERE _keep)"
        " SELECT doc_id, status, priority, valid_from,"
        "  lead(valid_from) OVER w2 AS valid_to,"
        "  lead(valid_from) OVER w2 IS NULL AS is_current"
        " FROM v WINDOW w2 AS (PARTITION BY doc_id ORDER BY valid_from)"
    ),
    "cdc_changefeed": (
        "SELECT CAST(o_custkey AS VARCHAR) AS doc_id, o_orderkey AS lsn,"
        " CASE WHEN lag(o_orderkey) OVER w IS NULL THEN 'insert'"
        "  ELSE 'update' END AS change_type,"
        " lag(o_totalprice) OVER w AS price_pre, o_totalprice AS price"
        " FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)"
    ),
    "cdc_patch": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn,"
        " CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS bal,"
        " CASE WHEN o_orderkey % 2 = 1 THEN 'PATCHED' END AS seg"
        " FROM orders)"
        " SELECT doc_id, max(lsn) AS lsn,"
        "  arg_max(bal, lsn) FILTER (WHERE bal IS NOT NULL) AS bal,"
        "  arg_max(seg, lsn) FILTER (WHERE seg IS NOT NULL) AS seg"
        " FROM ev GROUP BY doc_id"
    ),
    "cdc_merge_patch": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn,"
        " CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS bal,"
        " CASE WHEN o_orderkey % 2 = 1 THEN 'PATCHED' END AS seg"
        " FROM orders),"
        " p AS (SELECT doc_id,"
        "  arg_max(bal, lsn) FILTER (WHERE bal IS NOT NULL) AS bal,"
        "  arg_max(seg, lsn) FILTER (WHERE seg IS NOT NULL) AS seg"
        "  FROM ev GROUP BY doc_id)"
        " SELECT CAST(c_custkey AS VARCHAR) AS doc_id,"
        "  coalesce(p.bal, c_acctbal) AS bal,"
        "  coalesce(p.seg, c_mktsegment) AS seg"
        " FROM customer c LEFT JOIN p ON p.doc_id = CAST(c_custkey AS VARCHAR)"
    ),
    "cdc_auto_evolve": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_totalprice AS price,"
        " o_orderpriority AS priority FROM orders),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, lsn, price,"
        "  CASE WHEN lsn % 2 = 1 THEN priority END AS priority"
        " FROM w WHERE rn = 1"
    ),
}


def q_scd2_asof_enrich(spark, sf):
    """CDC dimension enrichment: join each change event to the SCD2
    dimension version that was CURRENT AS OF the event's LSN — the classic
    streaming-enrichment shape (late-arriving facts against a versioned
    dimension). Events: one per order carrying its price; dimension: the
    SCD2 (status, priority) history of the same customers, version
    boundaries at attribute changes. Implemented as the union+window as-of
    join (operators/asof.py — ONE shuffle on the key, no range-join
    explosion: at 10^10 events a BETWEEN-join would nest-loop). The oracle
    states the version pick directly with a lateral max(valid_from <= lsn).
    Rows before a customer's first version carry NULLs (as-of semantics)."""
    from rap_etl_spark.operators.asof import asof_join
    from rap_etl_spark.operators.cdc import scd2_history

    ev = _order_events(spark, sf)
    dim = scd2_history(
        ev.select("doc_id", "lsn", "status", "priority"),
        key="doc_id",
        lsn_col="lsn",
        tracked=["status", "priority"],
    ).select(
        "doc_id",
        "valid_from",
        F.col("status").alias("dim_status"),
        F.col("priority").alias("dim_priority"),
    )
    fact = ev.select("doc_id", "lsn", "price")
    return asof_join(
        fact,
        dim,
        key="doc_id",
        left_ts="lsn",
        right_ts="valid_from",
        right_payload=["dim_status", "dim_priority"],
    ).select("doc_id", "lsn", "price", "dim_status", "dim_priority")


CDC_QUERIES["scd2_asof_enrich"] = q_scd2_asof_enrich

def q_bucket_split_read(spark, sf):
    """Progressive bucket evolution end-to-end (lake.split_buckets): merge
    batch 0 into a 4-bucket table, DOUBLE the bucket count as a
    metadata-only commit (zero data files written), merge batch 1
    merge-on-read — its deltas land under the NEW modulus while every base
    file still carries the OLD one, so the read has to resolve the stack
    by hash-layout residue (pmod(h,2N)=b folds onto pmod(h,N)=b%N) — then
    materialize half the buckets (the key-sharing-closure maintenance
    path) and read. The oracle is the same global LWW statement as
    cdc_merge: bucket layout, split timing, and migration state are
    internal and must be invisible in the answer."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_totalprice").alias("price"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-split-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=4
        )
        table.merge(lww_latest(ev.filter(F.col("lsn") % 2 == 0)), batch_id=0)
        table.split_buckets(2)  # metadata-only: 4 -> 8 buckets
        table.merge(
            lww_latest(ev.filter(F.col("lsn") % 2 == 1)), batch_id=1,
            mode="mor",
        )
        table.materialize_deltas(buckets=set(range(4)))
        rows = table.read().select("doc_id", "lsn", "price").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES["bucket_split_read"] = q_bucket_split_read

CDC_ORACLES["bucket_split_read"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, o_totalprice AS price,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
    " FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
    " SELECT doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
)

CDC_ORACLES["scd2_asof_enrich"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn, o_orderstatus AS status,"
    " o_orderpriority AS priority, o_totalprice AS price FROM orders),"
    " keep AS (SELECT *, (lag(lsn) OVER w IS NULL"
    "   OR status IS DISTINCT FROM lag(status) OVER w"
    "   OR priority IS DISTINCT FROM lag(priority) OVER w) AS _keep"
    "  FROM ev WINDOW w AS (PARTITION BY doc_id ORDER BY lsn)),"
    " v AS (SELECT doc_id, status AS dim_status, priority AS dim_priority,"
    "  lsn AS valid_from FROM keep WHERE _keep)"
    " SELECT e.doc_id, e.lsn, e.price,"
    "  (SELECT v.dim_status FROM v WHERE v.doc_id = e.doc_id"
    "    AND v.valid_from <= e.lsn"
    "    ORDER BY v.valid_from DESC LIMIT 1) AS dim_status,"
    "  (SELECT v.dim_priority FROM v WHERE v.doc_id = e.doc_id"
    "    AND v.valid_from <= e.lsn"
    "    ORDER BY v.valid_from DESC LIMIT 1) AS dim_priority"
    " FROM ev e"
)


def _sync_stale_table(spark, sf):
    """Stale table state: customers NOT divisible by 4, with bal corrupted
    to -1.0 on custkey%3==0 rows (these become U on sync); odd custkeys are
    absent from the snapshot (become D); custkey%4==0 appear only in the
    snapshot (become I)."""
    return _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(-1.0))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    ).filter(F.col("c_custkey") % 4 != 0)


def _sync_snapshot(spark, sf):
    """The full source-of-truth snapshot: even custkeys, correct values."""
    return _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    ).filter(F.col("c_custkey") % 2 == 0)


def q_snapshot_diff(spark, sf):
    """Full-snapshot reconciliation diff (cdc.snapshot_diff) — the
    reference's add/remove publishing model: a snapshot asserting complete
    truth classified against stale table state into I (snapshot-only =
    add), D (table-only = remove), U (payload changed = re-publish),
    N (identical = empty diff, no write). One full-outer shuffle with the
    table side pruned to (key, 8-byte payload hash). Oracle states the
    same classification with a SQL FULL OUTER JOIN on values."""
    from rap_etl_spark.operators.cdc import snapshot_diff

    return snapshot_diff(
        _sync_snapshot(spark, sf),
        _sync_stale_table(spark, sf),
        payload_cols=["bal", "seg"],
    )


def q_snapshot_sync(spark, sf):
    """Snapshot sync END-TO-END through the real lake table: bootstrap the
    stale state with append (NULL row versions), reconcile against the
    truth snapshot, merge the non-N change set (I/U upsert, D delete)
    stamped with the sync LSN, and read the final state — which must equal
    the snapshot exactly (the oracle IS the snapshot expression). The
    N-majority never reaches the writer, so an unchanged re-sync commits
    zero data files (asserted in tests/test_snapshot_sync.py)."""
    from pyspark.sql import types as T

    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import snapshot_changes, snapshot_diff

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("bal", T.DoubleType()),
            T.StructField("seg", T.StringType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-snapsync-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        table.append(_sync_stale_table(spark, sf), batch_id=0, assume_unique=True)
        diff = snapshot_diff(
            _sync_snapshot(spark, sf), table.read(), payload_cols=["bal", "seg"]
        )
        table.merge(snapshot_changes(diff, sync_lsn=1), batch_id=1)
        rows = table.read().select("doc_id", "bal", "seg").collect()
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES["snapshot_diff"] = q_snapshot_diff
CDC_QUERIES["snapshot_sync"] = q_snapshot_sync

_SYNC_T = (
    "SELECT CAST(c_custkey AS VARCHAR) AS doc_id,"
    " CASE WHEN c_custkey % 3 = 0 THEN -1.0"
    "  ELSE c_acctbal END AS bal,"
    " c_mktsegment AS seg FROM customer WHERE c_custkey % 4 <> 0"
)
_SYNC_S = (
    "SELECT CAST(c_custkey AS VARCHAR) AS doc_id, c_acctbal AS bal,"
    " c_mktsegment AS seg FROM customer WHERE c_custkey % 2 = 0"
)

CDC_ORACLES["snapshot_diff"] = (
    f"WITH t AS ({_SYNC_T}), s AS ({_SYNC_S})"
    " SELECT coalesce(s.doc_id, t.doc_id) AS doc_id, s.bal, s.seg,"
    " CASE WHEN s.doc_id IS NULL THEN 'D'"
    "  WHEN t.doc_id IS NULL THEN 'I'"
    "  WHEN s.bal IS DISTINCT FROM t.bal"
    "   OR s.seg IS DISTINCT FROM t.seg THEN 'U'"
    "  ELSE 'N' END AS action"
    " FROM s FULL OUTER JOIN t ON s.doc_id = t.doc_id"
)
CDC_ORACLES["snapshot_sync"] = _SYNC_S


def q_cdc_quarantine(spark, sf):
    """X89 end-to-end: a deliberately dirty change stream (unknown op
    codes, null keys, negative LSNs, n_tok/payload disagreements —
    deterministic injections keyed off o_orderkey) driven through the
    REAL engine with a dead-letter dir. Output = the quarantined events
    tagged with their classifier reason UNION the table's surviving rows
    tagged 'live', so the oracle pins BOTH sides: exactly which rows were
    diverted (and why, in classifier order), and that the merge saw only
    the valid remainder."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.quarantine import REASON_COL, read_quarantine

    k = F.col("o_orderkey")
    ev = _t(spark, sf, "orders").select(
        F.when(k % 13 == 0, "X")
        .when(k % 10 == 0, "D")
        .otherwise("U")
        .alias("op"),
        F.when(k % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("doc_id"),
        F.when(k % 19 == 0, -k).otherwise(k).cast("long").alias("lsn"),
        F.array((k % 100).cast("int")).alias("tokens"),
        F.when(k % 23 == 0, F.lit(2)).otherwise(F.lit(1)).cast("int").alias("n_tok"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("n_tok", T.IntegerType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-quarantine-")
    try:
        t = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        qdir = os.path.join(work, "dlq")
        eng = CdcEngine(spark, t, quarantine_dir=qdir)
        m = eng.apply_batch(ev, batch_id=0)
        assert m.quarantined_rows > 0  # the injections must have fired
        bad = read_quarantine(spark, qdir).select(
            "lsn", F.col(REASON_COL).alias("tag")
        )
        live = t.read().select("lsn", F.lit("live").alias("tag"))
        rows = bad.unionByName(live).collect()
        out = T.StructType(
            [
                T.StructField("lsn", T.LongType()),
                T.StructField("tag", T.StringType()),
            ]
        )
        return spark.createDataFrame(rows, out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES["cdc_quarantine"] = q_cdc_quarantine

CDC_ORACLES["cdc_quarantine"] = (
    "WITH ev AS (SELECT"
    "  CASE WHEN o_orderkey % 13 = 0 THEN 'X'"
    "   WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,"
    "  CASE WHEN o_orderkey % 17 = 0 THEN NULL"
    "   ELSE CAST(o_custkey AS VARCHAR) END AS doc_id,"
    "  CASE WHEN o_orderkey % 19 = 0 THEN -o_orderkey"
    "   ELSE o_orderkey END AS lsn,"
    "  CASE WHEN o_orderkey % 23 = 0 THEN 2 ELSE 1 END AS n_tok,"
    "  1 AS tok_len FROM orders),"
    " cls AS (SELECT *, concat_ws(',',"
    "  CASE WHEN op IS NULL OR op NOT IN ('I','U','D') THEN 'bad_op' END,"
    "  CASE WHEN doc_id IS NULL OR doc_id = '' THEN 'null_key' END,"
    "  CASE WHEN lsn IS NULL OR lsn < 0 THEN 'bad_lsn' END,"
    "  CASE WHEN tok_len <> n_tok THEN 'ntok_mismatch' END) AS reason"
    "  FROM ev),"
    " bad AS (SELECT lsn, reason AS tag FROM cls WHERE reason <> ''),"
    " valid AS (SELECT * FROM cls WHERE reason = ''),"
    " w AS (SELECT *, row_number() OVER"
    "  (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM valid),"
    " live AS (SELECT lsn, 'live' AS tag FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT lsn, tag FROM bad UNION ALL SELECT lsn, tag FROM live"
)


def q_mv_incremental(spark, sf):
    """X92 end-to-end: a two-batch change stream (inserts, cross-group
    updates, deletes — derived deterministically from orders) through the
    REAL engine into a lake table, with a materialized aggregate view
    created after batch 0 and incrementally refreshed after batch 1 (the
    changefeed path, never a recompute). Output = the refreshed view.
    The oracle computes the definition query over the FULL final LWW
    state, so any IVM drift — a group missed, a delete not unfolded, a
    moved key double-counted — breaks the value hash."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.mv import MaterializedView

    k = F.col("o_orderkey")
    ev = _t(spark, sf, "orders").select(
        F.when(k % 10 == 0, "D").otherwise("U").alias("op"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("doc_id"),
        k.cast("long").alias("lsn"),
        F.col("o_orderpriority").alias("grp"),
        (k % 97).cast("long").alias("val"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-mv-")
    try:
        t = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        eng = CdcEngine(spark, t)
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 0), batch_id=0)
        mv = MaterializedView.create(
            spark,
            os.path.join(work, "mv"),
            t,
            {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]},
        )
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 1), batch_id=1)
        info = mv.refresh()
        assert not info.skipped and not info.full_recompute
        rows = mv.read().collect()
        out = T.StructType(
            [
                T.StructField("grp", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("val", T.LongType()),
            ]
        )
        return spark.createDataFrame(rows, out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES["mv_incremental"] = q_mv_incremental

CDC_ORACLES["mv_incremental"] = (
    "WITH ev AS (SELECT"
    "  CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,"
    "  'c' || CAST(o_custkey AS VARCHAR) AS doc_id,"
    "  o_orderkey AS lsn,"
    "  o_orderpriority AS grp,"
    "  o_orderkey % 97 AS val FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "  (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT grp, count(*) AS n, CAST(sum(val) AS BIGINT) AS val"
    " FROM live GROUP BY grp"
)


def q_mv_token_stats(spark, sf):
    """X92's tokens-payload kind end-to-end: a vocabulary/frequency view
    over a CDC'd tokenized-sequence table, bootstrapped with the one
    corpus-wide explode and then refreshed from the changefeed alone
    (maintain_token_stats — only batch 1's token arrays explode; updates
    fold preimage -1 / postimage +1, zero-frequency tokens drop out).
    Oracle = explode-and-count over the final LWW state."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.mv import MaterializedView

    k = F.col("o_orderkey")
    ev = _t(spark, sf, "orders").select(
        F.when(k % 10 == 0, "D").otherwise("U").alias("op"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("doc_id"),
        k.cast("long").alias("lsn"),
        F.array(
            (k % 50).cast("int"),
            (F.col("o_custkey") % 50).cast("int"),
            ((k + F.col("o_custkey")) % 50).cast("int"),
        ).alias("tokens"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-mv-tok-")
    try:
        t = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        eng = CdcEngine(spark, t)
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 0), batch_id=0)
        mv = MaterializedView.create(
            spark,
            os.path.join(work, "mv"),
            t,
            {"kind": "token_stats", "tokens_col": "tokens"},
        )
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 1), batch_id=1)
        info = mv.refresh()
        assert not info.skipped and not info.full_recompute
        rows = mv.read().collect()
        out = T.StructType(
            [
                T.StructField("token", T.IntegerType()),
                T.StructField("freq", T.LongType()),
            ]
        )
        return spark.createDataFrame(rows, out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES["mv_token_stats"] = q_mv_token_stats

CDC_ORACLES["mv_token_stats"] = (
    "WITH ev AS (SELECT"
    "  CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,"
    "  'c' || CAST(o_custkey AS VARCHAR) AS doc_id,"
    "  o_orderkey AS lsn,"
    "  [CAST(o_orderkey % 50 AS INT), CAST(o_custkey % 50 AS INT),"
    "   CAST((o_orderkey + o_custkey) % 50 AS INT)] AS tokens FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "  (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D'),"
    " tok AS (SELECT CAST(unnest(tokens) AS INT) AS token FROM live)"
    " SELECT token, count(*) AS freq FROM tok GROUP BY token"
)


def q_mv_join(spark, sf):
    """X92 join kind: a fact lake table maintained by the engine, a
    customer dimension read straight from the sf dir, and a join VIEW
    refreshed incrementally across a batch that inserts, re-points (the
    update moves a fact row to a different dim key), and deletes. The
    oracle joins the final LWW state against the same dimension."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.mv import MaterializedView

    k = F.col("o_orderkey")
    ev = _t(spark, sf, "orders").select(
        F.when(k % 11 == 0, "D").otherwise("U").alias("op"),
        # keys collide (mod 997): most see several events, so the refresh
        # exercises real LWW updates and deletes, not just inserts
        F.concat(F.lit("o"), (k % 997).cast("string")).alias("doc_id"),
        k.cast("long").alias("lsn"),
        # the update half re-points half the keys at a shifted customer
        F.when(k % 2 == 1, F.col("o_custkey") + 1)
        .otherwise(F.col("o_custkey"))
        .cast("long")
        .alias("cust"),
        (k % 53).cast("long").alias("val"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("cust", T.LongType()),
            T.StructField("val", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-mvjoin-")
    try:
        t = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        eng = CdcEngine(spark, t)
        eng.apply_batch(ev.filter(F.col("lsn") % 3 != 2), batch_id=0)
        mv = MaterializedView.create(
            spark,
            os.path.join(work, "mv"),
            t,
            {
                "kind": "join",
                "dim_path": os.path.join(sf, "customer.parquet"),
                "fact_col": "cust",
                "dim_col": "c_custkey",
                "how": "inner",
                "select": ["doc_id", "val", "c_nationkey"],
            },
        )
        eng.apply_batch(ev.filter(F.col("lsn") % 3 == 2), batch_id=1)
        info = mv.refresh()
        assert not info.skipped and not info.full_recompute
        rows = mv.read().collect()
        out = T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("val", T.LongType()),
                T.StructField("c_nationkey", T.IntegerType()),
            ]
        )
        return spark.createDataFrame(rows, out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES["mv_join"] = q_mv_join

CDC_ORACLES["mv_join"] = (
    "WITH ev AS (SELECT"
    "  CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,"
    "  'o' || CAST(o_orderkey % 997 AS VARCHAR) AS doc_id,"
    "  o_orderkey AS lsn,"
    "  CASE WHEN o_orderkey % 2 = 1 THEN o_custkey + 1"
    "   ELSE o_custkey END AS cust,"
    "  o_orderkey % 53 AS val FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "  (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT doc_id, val, c_nationkey FROM live"
    " JOIN customer ON cust = c_custkey"
)


def q_row_lineage(spark, sf):
    """Row-lineage view (X101, cdc.row_lineage — the consumer-side shape of
    Iceberg v3 row lineage): per live key, the LSN that created its current
    incarnation (row_id — stable across updates, reset by delete+reinsert),
    the winning LSN (last_updated_lsn = the table's stored _lsn), and the
    incarnation's version count. Change stream: doc_id = custkey,
    lsn = orderkey, delete on every orderkey % 7 == 3 — keys keep ordering
    events after their deletes, so reincarnation is exercised throughout.
    ONE exchange end-to-end: the no-order window and the groupBy share the
    same hash partitioning (pinned in test_plan_shapes)."""
    from rap_etl_spark.operators.cdc import row_lineage

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.when(F.col("o_orderkey") % 7 == 3, "D").otherwise("U").alias("op"),
    )
    return row_lineage(ev)


CDC_QUERIES["row_lineage"] = q_row_lineage

CDC_ORACLES["row_lineage"] = (
    "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
    " o_orderkey AS lsn,"
    " CASE WHEN o_orderkey % 7 = 3 THEN 'D' ELSE 'U' END AS op"
    " FROM orders),"
    " d AS (SELECT doc_id, max(CASE WHEN op = 'D' THEN lsn END) AS last_del"
    "  FROM ev GROUP BY doc_id)"
    " SELECT e.doc_id, min(e.lsn) AS row_id,"
    "  max(e.lsn) AS last_updated_lsn, count(*) AS n_versions"
    " FROM ev e JOIN d ON e.doc_id = d.doc_id"
    " WHERE e.op <> 'D' AND e.lsn > COALESCE(d.last_del, -1)"
    " GROUP BY e.doc_id"
)


def q_mv_distinct_sketch(spark, sf):
    """X102 end-to-end: a per-group HLL DISTINCT view over a CDC'd table —
    created after batch 0, incrementally refreshed after batch 1 (inserts
    fold by scalar hll_union; the batch's deletes/updates force the dirty
    broadcast-semi re-aggregation path). val = orderkey % 97 keeps every
    group's domain (≤97 values) deep inside the lgk=12 coupon (exact)
    regime, so the sketch ESTIMATE must equal the oracle's exact
    COUNT(DISTINCT) over the final LWW state — the same exact-regime
    strategy that oracles the standalone sketch keys. The binary sketch
    column stays internal; the compared output is (grp, n, est)."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.mv import MaterializedView

    k = F.col("o_orderkey")
    ev = _t(spark, sf, "orders").select(
        F.when(k % 10 == 0, "D").otherwise("U").alias("op"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("doc_id"),
        k.cast("long").alias("lsn"),
        F.col("o_orderpriority").alias("grp"),
        (k % 97).cast("long").alias("val"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-mv-sk-")
    try:
        t = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        eng = CdcEngine(spark, t)
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 0), batch_id=0)
        mv = MaterializedView.create(
            spark,
            os.path.join(work, "mv"),
            t,
            {
                "kind": "distinct_sketch",
                "group_cols": ["grp"],
                "val_col": "val",
                "lgk": 12,
            },
        )
        eng.apply_batch(ev.filter(F.col("lsn") % 2 == 1), batch_id=1)
        info = mv.refresh()
        assert not info.skipped and not info.full_recompute
        rows = mv.read().select("grp", "n", "est").collect()
        out = T.StructType(
            [
                T.StructField("grp", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("est", T.LongType()),
            ]
        )
        return spark.createDataFrame(rows, out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES["mv_distinct_sketch"] = q_mv_distinct_sketch

CDC_ORACLES["mv_distinct_sketch"] = (
    "WITH ev AS (SELECT"
    "  CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,"
    "  'c' || CAST(o_custkey AS VARCHAR) AS doc_id,"
    "  o_orderkey AS lsn,"
    "  o_orderpriority AS grp,"
    "  o_orderkey % 97 AS val FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "  (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev),"
    " live AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')"
    " SELECT grp, count(*) AS n,"
    "  CAST(count(DISTINCT val) AS BIGINT) AS est"
    " FROM live GROUP BY grp"
)
