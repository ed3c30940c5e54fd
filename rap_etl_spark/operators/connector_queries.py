"""CDC connector-surface queries (round 3): the pieces a real log-based
connector deployment needs around the core merge — envelope decode,
dead-letter quarantine, replication-lag monitoring, snapshot-bootstrap
handoff — plus the tokens-axis distribution-drift monitor.

Every query is value-oracled against DuckDB. Where a query consumes JSON,
BOTH engines first construct byte-identical envelope strings from the same
star-schema rows (pure string concat of integer/string casts — no
float formatting in the wire text), then parse with their own native JSON
machinery — so the oracle exercises the parse itself, not a shortcut.

Scale notes per query in the docstrings; the common theme: envelope decode
and DLQ classification are zero-exchange scan-stage work; the lag monitor
aggregates to O(partitions) rows before anything joins; bootstrap handoff
reuses the version-conditional merge (stale overlap rows lose by LSN, so
replaying a COMPLETE log suffix from below the snapshot point is provably
convergent); drift is exact-integer arithmetic on pre-combined counts.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from rap_etl_spark.operators.relational import _t

# ---------------------------------------------------------------------------
# shared envelope construction (Spark side) — mirrored verbatim in the oracle
# ---------------------------------------------------------------------------


def _order_envelopes(spark, sf):
    """Debezium-style envelope per order: op d on every 10th orderkey
    (before-image only), u on odd keys, c on the rest (after-image only).
    price travels as integer cents so the wire text is float-free."""
    o = _t(spark, sf, "orders")
    doc_id = F.col("o_custkey").cast("string")
    lsn = F.col("o_orderkey")
    price_c = F.round(F.col("o_totalprice") * 100).cast("long")
    op = (
        F.when(lsn % 10 == 0, "d").when(lsn % 2 == 1, "u").otherwise("c")
    )
    after = F.when(
        op != "d",
        F.concat(
            F.lit('{"doc_id":"'),
            doc_id,
            F.lit('","price_c":'),
            price_c.cast("string"),
            F.lit("}"),
        ),
    ).otherwise(F.lit("null"))
    before = F.when(
        op == "d", F.concat(F.lit('{"doc_id":"'), doc_id, F.lit('"}'))
    ).otherwise(F.lit("null"))
    env = F.concat(
        F.lit('{"op":"'),
        op,
        F.lit('","before":'),
        before,
        F.lit(',"after":'),
        after,
        F.lit(',"source":{"lsn":'),
        lsn.cast("string"),
        F.lit(',"table":"docs"},"ts_ms":'),
        (lsn * 1000).cast("string"),
        F.lit("}"),
    )
    return o.select(env.alias("env"))


_ORACLE_ENVELOPES = (
    "SELECT '{\"op\":\"' || opx || '\",\"before\":' ||"
    " CASE WHEN opx = 'd' THEN '{\"doc_id\":\"' || doc_id || '\"}'"
    "  ELSE 'null' END ||"
    " ',\"after\":' ||"
    " CASE WHEN opx = 'd' THEN 'null'"
    "  ELSE '{\"doc_id\":\"' || doc_id || '\",\"price_c\":' ||"
    "   CAST(price_c AS VARCHAR) || '}' END ||"
    " ',\"source\":{\"lsn\":' || CAST(lsn AS VARCHAR) ||"
    " ',\"table\":\"docs\"},\"ts_ms\":' || CAST(lsn * 1000 AS VARCHAR) || '}'"
    " AS env FROM ("
    "  SELECT CAST(o_custkey AS VARCHAR) AS doc_id, o_orderkey AS lsn,"
    "   CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,"
    "   CASE WHEN o_orderkey % 10 = 0 THEN 'd'"
    "    WHEN o_orderkey % 2 = 1 THEN 'u' ELSE 'c' END AS opx"
    "  FROM orders)"
)


def q_cdc_envelope_parse(spark, sf):
    """Debezium envelope decode (cdc.parse_debezium_envelope): construct
    the connector wire format from `orders`, then decode it back to this
    engine's change-event shape with ONE JVM from_json per row — key from
    after (upserts) or before (deletes), LSN from source.lsn, op mapped
    c/r->I u->U d->D. Zero exchanges: decode lives in the scan stage."""
    from rap_etl_spark.operators.cdc import parse_debezium_envelope

    env = _order_envelopes(spark, sf)
    parsed = parse_debezium_envelope(
        env, "env", "doc_id: STRING, price_c: BIGINT"
    )
    return parsed.select("doc_id", "lsn", "op", "price_c", "ts_ms")


def q_cdc_dlq(spark, sf):
    """Dead-letter quarantine audit (cdc.split_dlq): a poisoned event feed
    — every 7th event's JSON truncated mid-token, every 11th valid but
    missing the required field — classified malformed/missing/ok without
    failing the batch, via Spark's columnNameOfCorruptRecord idiom (the
    DuckDB oracle uses json_valid + guarded extract). Returns the per-type
    disposition counts the DLQ dashboard would show. The classification is
    a narrow projection; the only exchange is the final tiny rollup."""
    e = _t(spark, sf, "events")
    env = (
        F.when(F.col("event_id") % 7 == 0, F.substring("props", 1, 4))
        .when(F.col("event_id") % 11 == 0, F.lit('{"other": 1}'))
        .otherwise(F.col("props"))
    )
    j = e.select(
        "event_type",
        F.from_json(
            env, "k INT, _corrupt STRING", {"columnNameOfCorruptRecord": "_corrupt"}
        ).alias("p"),
    )
    disposition = (
        F.when(F.col("p._corrupt").isNotNull(), "malformed_json")
        .when(F.col("p.k").isNull(), "missing_field:k")
        .otherwise("ok")
    )
    return (
        j.select("event_type", disposition.alias("disposition"))
        .groupBy("event_type", "disposition")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_cdc_lag(spark, sf):
    """Replication-lag monitor (cdc.replication_lag): per event_type
    partition, the source high-water LSN vs the applied high-water LSN
    (applied = everything committed before the cutoff wall-clock), the
    outstanding-event count, and the exact time lag in microseconds —
    the consumer-lag panel for the CDC tail. O(partitions) rows move."""
    from rap_etl_spark.operators.cdc import replication_lag

    e = _t(spark, sf, "events").select(
        "event_type", F.col("event_id").alias("lsn"), "ts"
    )
    applied = e.filter(F.col("ts") <= F.lit("2024-01-20 00:00:00").cast("timestamp"))
    return replication_lag(
        e, applied, part_col="event_type", lsn_col="lsn", ts_col="ts"
    )


def q_cdc_bootstrap(spark, sf):
    """Snapshot-bootstrap handoff end-to-end: the standard connector
    startup — take a consistent snapshot at LSN L (initial_load bucketed
    append), then tail the log from BELOW the snapshot point (lsn > L-L/4,
    a deliberate overlap) in two version-conditional merges. The overlap
    replays a COMPLETE log suffix, so every resent event either loses to
    the stored LSN or reapplies its own final state — the oracle is the
    plain global LWW over the whole log, independent of where the handoff
    happened. Deletes on every 7th key exercise tombstones across the
    boundary (a delete resent into a key the snapshot already dropped must
    no-op)."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import initial_load
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("o_orderkey") % 7 == 3, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("priority", T.StringType()),
        ]
    )
    max_lsn = ev.agg(F.max("lsn")).first()[0]
    snap_lsn = max_lsn // 2
    tail_from = snap_lsn - snap_lsn // 4  # replay overlap below the snapshot
    work = tempfile.mkdtemp(prefix="rap-etl-bootstrap-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        snap = lww_latest(ev.filter(F.col("lsn") <= snap_lsn))
        initial_load(
            spark,
            table,
            snap.filter(F.col("op") != "D").select(
                "doc_id", "lsn", "price", "priority"
            ),
            batch_id=0,
        )
        tail = ev.filter(F.col("lsn") > tail_from)
        for batch_id in (1, 2):
            batch = tail.filter(F.col("lsn") % 2 == batch_id - 1)
            table.merge(lww_latest(batch), batch_id=batch_id)
        rows = table.read().select(
            "doc_id", "lsn", "price", "priority"
        ).collect()
        return spark.createDataFrame(rows, schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_cdc_emit_envelope(spark, sf):
    """Envelope EMIT roundtrip (cdc.emit_debezium_envelope — the producer
    half): engine-shaped change rows from `orders` are encoded to the
    Debezium wire envelope (JVM to_json, nulls explicit) and decoded back
    with the inbound parser; the oracle states the original change rows
    directly, so a green row proves parse∘emit = identity by value —
    including null after-images on deletes. Both directions are scan-stage
    JSON work: zero exchanges."""
    from rap_etl_spark.operators.cdc import (
        emit_debezium_envelope,
        parse_debezium_envelope,
    )

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.when(F.col("o_orderkey") % 10 == 0, "D")
        .when(F.col("o_orderkey") % 2 == 1, "U")
        .otherwise("I")
        .alias("op"),
    )
    env = emit_debezium_envelope(ev, ["price_c"])
    parsed = parse_debezium_envelope(env, "env", "doc_id: STRING, price_c: BIGINT")
    return parsed.select("doc_id", "lsn", "op", "price_c", "ts_ms")


def q_cdc_chunked_bootstrap(spark, sf):
    """Pause-free CHUNKED bootstrap end-to-end (engine.chunked_bootstrap —
    the DBLog watermark algorithm): the source is snapshotted in 4 hash
    key-chunks INTERLEAVED with a live 3-batch log tail; each chunk SELECT
    observes a source state strictly AHEAD of the applied log (gap =
    max_lsn/7) and its rows are merged stamped with the chunk's low
    watermark. Deletes on every 5th key cross the chunk windows both ways
    (deleted-before-select keys must stay gone; selected-then-deleted keys
    must die when the tail catches up). Convergence oracle: the final
    table PAYLOAD per key equals the plain global LWW of the whole log —
    independent of chunking. The version column is excluded by design: a
    DBLog source exposes no per-row version, so chunk rows legitimately
    carry the watermark stamp, not the source LSN (payload equality is
    exactly BASELINE.json's per-row invariant)."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import chunked_bootstrap
    from rap_etl_spark.lake import ManifestParquetTable
    from rap_etl_spark.operators.cdc import lww_latest

    ev = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("doc_id"),
        F.col("o_orderkey").alias("lsn"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.when(F.col("o_orderkey") % 5 == 2, "D").otherwise("U").alias("op"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    max_lsn = ev.agg(F.max("lsn")).first()[0]
    t1, t2 = max_lsn // 3, 2 * max_lsn // 3
    gap = max_lsn // 7
    n_chunks = 4

    def select_chunk(cid, lo):
        # the consistent chunk read: source state as of lo + gap (the
        # source keeps moving while we chunk), live rows only, this
        # chunk's keys only, NO version column exposed
        s = min(lo + gap, max_lsn)
        view = lww_latest(ev.filter(F.col("lsn") <= s))
        return (
            view.filter(F.col("op") != "D")
            .filter(F.pmod(F.xxhash64("doc_id"), F.lit(n_chunks)) == cid)
            .select("doc_id", "status", "price")
        )

    batches = [
        (lww_latest(ev.filter(F.col("lsn") <= t1)), t1),
        (lww_latest(ev.filter((F.col("lsn") > t1) & (F.col("lsn") <= t2))), t2),
        (lww_latest(ev.filter(F.col("lsn") > t2)), max_lsn),
    ]
    work = tempfile.mkdtemp(prefix="rap-etl-chunked-bootstrap-")
    try:
        table = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        chunked_bootstrap(spark, table, select_chunk, n_chunks, batches)
        out_schema = T.StructType(
            [f for f in schema.fields if f.name != "lsn"]
        )
        rows = table.read().select("doc_id", "status", "price").collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_envelope_registry(spark, sf):
    """Schema-registry ingest gate (X100, sources/registry.py): wire rows
    from `orders` are stamped with a writer-schema version (o_orderkey%5 →
    v1 / v2 / v3-retired / v4-never-registered / NULL), a registry is
    populated with v1 → v2 → v3 (each a legal BACKWARD evolution; v3 then
    retired), and gate_envelopes splits the feed. Output: per-version
    disposition counts + the resolved reader DDL's field count for
    accepted rows (n_fields proves the right version's schema was bound,
    not just that the row passed). The gate folds the registry's accept
    set into scan-stage literals — zero exchanges before the tiny rollup,
    nothing per-row in Python; the registry doc itself is O(versions)
    bytes read once on the driver."""
    from pyspark.sql import types as T

    from rap_etl_spark.sources.registry import SchemaRegistry, gate_envelopes

    work = tempfile.mkdtemp(prefix="rap-etl-registry-")
    try:
        reg = SchemaRegistry(os.path.join(work, "reg"))
        v1 = T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("price_c", T.LongType(), True),
            ]
        )
        v2 = T.StructType(
            [*v1.fields, T.StructField("priority", T.StringType(), True)]
        )
        v3 = T.StructType(
            [*v2.fields, T.StructField("status", T.StringType(), True)]
        )
        for s in (v1, v2, v3):
            reg.register("docs", s)
        reg.retire("docs", 3)

        o = _t(spark, sf, "orders")
        m = F.col("o_orderkey") % 5
        sv = (
            F.when(m == 0, 1)
            .when(m == 1, 2)
            .when(m == 2, 3)
            .when(m == 3, 4)
            .cast("int")
        )
        wire = o.select(
            F.concat(
                F.lit('{"op":"c","after":{"doc_id":"'),
                F.col("o_custkey").cast("string"),
                F.lit('"}}'),
            ).alias("env"),
            sv.alias("schema_version"),
        )
        good, dead = gate_envelopes(wire, reg, "docs")
        g = good.groupBy("schema_version").agg(
            F.first(
                F.size(F.split("_schema_ddl", ",")).cast("int")
            ).alias("n_fields"),
            F.count(F.lit(1)).alias("n"),
        ).select(
            "schema_version",
            F.lit("accepted").alias("disposition"),
            "n_fields",
            "n",
        )
        d = dead.groupBy("schema_version", "dlq_reason").agg(
            F.count(F.lit(1)).alias("n")
        ).select(
            "schema_version",
            F.col("dlq_reason").alias("disposition"),
            F.lit(None).cast("int").alias("n_fields"),
            "n",
        )
        return g.unionByName(d)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_token_drift(spark, sf):
    """Source-distribution drift (text.unigram_drift): per source, the
    total-variation distance between its unigram distribution and the
    corpus-wide one, as an EXACT integer numerator (drift_num over
    2*n_group*n_all) — bit-stable across engines because no float ever
    sums. The mix monitor for a training-data pipeline."""
    from rap_etl_spark.operators.text import unigram_drift

    return unigram_drift(_t(spark, sf, "documents"), "text", "source")


CONNECTOR_QUERIES = {
    "cdc_envelope_parse": q_cdc_envelope_parse,
    "cdc_dlq": q_cdc_dlq,
    "cdc_lag": q_cdc_lag,
    "cdc_bootstrap": q_cdc_bootstrap,
    "cdc_emit_envelope": q_cdc_emit_envelope,
    "cdc_chunked_bootstrap": q_cdc_chunked_bootstrap,
    "token_drift": q_token_drift,
    "envelope_registry": q_envelope_registry,
}

CONNECTOR_ORACLES = {
    "cdc_envelope_parse": (
        "WITH env AS (" + _ORACLE_ENVELOPES + ")"
        " SELECT COALESCE(json_extract_string(env, '$.after.doc_id'),"
        "   json_extract_string(env, '$.before.doc_id')) AS doc_id,"
        " CAST(json_extract_string(env, '$.source.lsn') AS BIGINT) AS lsn,"
        " CASE json_extract_string(env, '$.op') WHEN 'd' THEN 'D'"
        "  WHEN 'u' THEN 'U' ELSE 'I' END AS op,"
        " CAST(json_extract_string(env, '$.after.price_c') AS BIGINT)"
        "  AS price_c,"
        " CAST(json_extract_string(env, '$.ts_ms') AS BIGINT) AS ts_ms"
        " FROM env"
    ),
    "cdc_dlq": (
        "WITH fed AS (SELECT event_type,"
        " CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 4)"
        "  WHEN event_id % 11 = 0 THEN '{\"other\": 1}'"
        "  ELSE props END AS env FROM events)"
        " SELECT event_type,"
        " CASE WHEN NOT json_valid(env) THEN 'malformed_json'"
        "  WHEN json_extract_string(env, '$.k') IS NULL"
        "   THEN 'missing_field:k'"
        "  ELSE 'ok' END AS disposition,"
        " count(*) AS n FROM fed GROUP BY event_type, disposition"
    ),
    "cdc_lag": (
        "WITH src AS (SELECT event_type, max(event_id) AS source_max_lsn,"
        "  count(*) AS source_events, max(epoch_us(ts)) AS src_us"
        "  FROM events GROUP BY event_type),"
        " app AS (SELECT event_type, max(event_id) AS applied_max_lsn,"
        "  max(epoch_us(ts)) AS app_us FROM events"
        "  WHERE ts <= TIMESTAMP '2024-01-20 00:00:00' GROUP BY event_type),"
        # LEFT join + IS NULL arm: a partition with ZERO applied rows lags
        # by ALL its source events (matching replication_lag's isNull
        # filter) — an inner join here would silently report 0 for it
        " lagc AS (SELECT e.event_type, count(*) AS lag_events FROM events e"
        "  LEFT JOIN app ON e.event_type = app.event_type"
        "  WHERE app.applied_max_lsn IS NULL"
        "   OR e.event_id > app.applied_max_lsn GROUP BY e.event_type)"
        " SELECT src.event_type, src.source_max_lsn, app.applied_max_lsn,"
        "  COALESCE(lagc.lag_events, 0) AS lag_events,"
        "  src.src_us - app.app_us AS lag_us"
        " FROM src LEFT JOIN app ON src.event_type = app.event_type"
        " LEFT JOIN lagc ON src.event_type = lagc.event_type"
    ),
    "cdc_bootstrap": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_totalprice AS price,"
        " o_orderpriority AS priority,"
        " CASE WHEN o_orderkey % 7 = 3 THEN 'D' ELSE 'U' END AS op"
        " FROM orders),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, lsn, price, priority FROM w"
        " WHERE rn = 1 AND op <> 'D'"
    ),
    "cdc_emit_envelope": (
        "SELECT CAST(o_custkey AS VARCHAR) AS doc_id, o_orderkey AS lsn,"
        " CASE WHEN o_orderkey % 10 = 0 THEN 'D'"
        "  WHEN o_orderkey % 2 = 1 THEN 'U' ELSE 'I' END AS op,"
        " CASE WHEN o_orderkey % 10 = 0 THEN NULL"
        "  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS price_c,"
        " o_orderkey * 1000 AS ts_ms FROM orders"
    ),
    "cdc_chunked_bootstrap": (
        "WITH ev AS (SELECT CAST(o_custkey AS VARCHAR) AS doc_id,"
        " o_orderkey AS lsn, o_orderstatus AS status, o_totalprice AS price,"
        " CASE WHEN o_orderkey % 5 = 2 THEN 'D' ELSE 'U' END AS op"
        " FROM orders),"
        " w AS (SELECT *, row_number() OVER"
        " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
        " SELECT doc_id, status, price FROM w"
        " WHERE rn = 1 AND op <> 'D'"
    ),
    "token_drift": (
        "WITH words AS (SELECT source AS g,"
        "  unnest(string_split(text, ' ')) AS word FROM documents),"
        " pair AS (SELECT g, word, count(*) AS c_g FROM words"
        "  GROUP BY g, word),"
        " wtot AS (SELECT word, sum(c_g) AS c_all FROM pair GROUP BY word),"
        " gtot AS (SELECT g, sum(c_g) AS n_g FROM pair GROUP BY g),"
        " ntot AS (SELECT sum(n_g) AS n_all FROM gtot)"
        " SELECT pair.g AS source,"
        "  CAST(any_value(gtot.n_g) AS BIGINT) AS n_group,"
        "  CAST(any_value(ntot.n_all) AS BIGINT) AS n_all,"
        "  CAST(sum(abs(pair.c_g * ntot.n_all - wtot.c_all * gtot.n_g))"
        "   + any_value(gtot.n_g)"
        "     * (any_value(ntot.n_all) - sum(wtot.c_all)) AS BIGINT)"
        "   AS drift_num"
        " FROM pair JOIN wtot USING (word) JOIN gtot USING (g), ntot"
        " GROUP BY pair.g"
    ),
}


def q_cdc_fanout(spark, sf):
    """Multi-table fanout end-to-end (engine.fanout_apply): one change
    stream carrying a route column (customers split by key parity) applied
    to TWO lake tables across two interleaved-LSN batches — each route
    commits through its own table's ledger under the shared batch id, and
    the version-conditional merge makes each table's final state the
    global LWW of its route. Returns both tables' states tagged by route;
    the oracle states exactly that window per route."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import fanout_apply
    from rap_etl_spark.lake import ManifestParquetTable

    ev = _t(spark, sf, "orders").select(
        F.when(F.col("o_custkey") % 2 == 0, "even").otherwise("odd").alias("_table"),
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
    out_schema = T.StructType(
        [T.StructField("route", T.StringType())] + list(schema.fields)
    )
    work = tempfile.mkdtemp(prefix="rap-etl-fanout-")
    try:
        tables = {
            name: ManifestParquetTable.create(
                spark, os.path.join(work, name), schema, n_buckets=4
            )
            for name in ("even", "odd")
        }
        for batch_id in (0, 1):
            fanout_apply(
                spark,
                ev.filter(F.col("lsn") % 2 == batch_id),
                tables,
                batch_id=batch_id,
                count_input=False,
            )
        rows = []
        for name, t in tables.items():
            rows += [
                (name, r["doc_id"], r["lsn"], r["price"])
                for r in t.read().collect()
            ]
        return spark.createDataFrame(rows, out_schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CONNECTOR_QUERIES["cdc_fanout"] = q_cdc_fanout

CONNECTOR_ORACLES["cdc_fanout"] = (
    "WITH ev AS (SELECT CASE WHEN o_custkey % 2 = 0 THEN 'even'"
    "  ELSE 'odd' END AS route,"
    " CAST(o_custkey AS VARCHAR) AS doc_id, o_orderkey AS lsn,"
    " o_totalprice AS price,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
    " FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
    " SELECT route, doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
)


def q_cdc_fanout_txn(spark, sf):
    """Catalog-atomic fanout end-to-end (catalog.fanout_apply_txn): the
    same two-route split as `cdc_fanout`, but applied through a
    snapshot-consistent catalog — per-table merges publish to catalog
    readers in ONE atomic pin swap per batch, with a simulated crash
    before batch 1's swap (table commits land, swap doesn't) repaired by
    redelivery. The final CATALOG view must equal the global LWW per
    route — same oracle as the retry-level fanout, proving the txn layer
    changes visibility, never results."""
    from pyspark.sql import types as T

    from rap_etl_spark.catalog import Catalog, fanout_apply_txn
    from rap_etl_spark.engine import fanout_apply
    from rap_etl_spark.lake import ManifestParquetTable

    ev = _t(spark, sf, "orders").select(
        F.when(F.col("o_custkey") % 2 == 0, "even").otherwise("odd").alias("_table"),
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
    out_schema = T.StructType(
        [T.StructField("route", T.StringType())] + list(schema.fields)
    )
    work = tempfile.mkdtemp(prefix="rap-etl-fanout-txn-")
    try:
        cat = Catalog.create(spark, os.path.join(work, "cat"))
        for name in ("even", "odd"):
            cat.register(
                name,
                ManifestParquetTable.create(
                    spark, os.path.join(work, name), schema, n_buckets=4
                ),
            )
        fanout_apply_txn(
            spark, cat, ev.filter(F.col("lsn") % 2 == 0), batch_id=0,
            count_input=False,
        )
        # batch 1 "crashes" after the table-level merges, before the swap…
        fanout_apply(
            spark,
            ev.filter(F.col("lsn") % 2 == 1),
            {n: cat.table(n) for n in cat.names()},
            batch_id=1,
            count_input=False,
        )
        # …redelivery skips the committed merges and completes the swap
        fanout_apply_txn(
            spark, cat, ev.filter(F.col("lsn") % 2 == 1), batch_id=1,
            count_input=False,
        )
        rows = []
        for name in cat.names():
            rows += [
                (name, r["doc_id"], r["lsn"], r["price"])
                for r in cat.read(name).collect()
            ]
        return spark.createDataFrame(rows, out_schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CONNECTOR_QUERIES["cdc_fanout_txn"] = q_cdc_fanout_txn

CONNECTOR_ORACLES["cdc_fanout_txn"] = (
    "WITH ev AS (SELECT CASE WHEN o_custkey % 2 = 0 THEN 'even'"
    "  ELSE 'odd' END AS route,"
    " CAST(o_custkey AS VARCHAR) AS doc_id, o_orderkey AS lsn,"
    " o_totalprice AS price,"
    " CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op"
    " FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    " (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
    " SELECT route, doc_id, lsn, price FROM w WHERE rn = 1 AND op <> 'D'"
)


CONNECTOR_ORACLES["envelope_registry"] = (
    # mirror of q_envelope_registry's version stamping and the registry
    # state (v1/v2 live with 2/3 reader fields, v3 retired, v4 unknown)
    "WITH w AS (SELECT o_orderkey % 5 AS m FROM orders)"
    " SELECT"
    "  CASE WHEN m = 0 THEN 1 WHEN m = 1 THEN 2 WHEN m = 2 THEN 3"
    "   WHEN m = 3 THEN 4 END AS schema_version,"
    "  CASE WHEN m = 0 OR m = 1 THEN 'accepted'"
    "   WHEN m = 2 THEN 'retired_schema:3'"
    "   WHEN m = 3 THEN 'unregistered_schema:4'"
    "   ELSE 'missing_field:schema_version' END AS disposition,"
    "  CASE WHEN m = 0 THEN 2 WHEN m = 1 THEN 3 END AS n_fields,"
    "  count(*) AS n"
    " FROM w GROUP BY 1, 2, 3"
)


def q_cdc_requeue(spark, sf):
    """Quarantine requeue end-to-end (X103, engine.requeue_quarantine):
    a change stream where every third event declares a WRONG n_tok
    (ntok_mismatch — the classic connector bug) and every seventh is a
    delete, replayed with the DLQ classifier on (bad rows divert, batch
    keeps flowing), then repaired with the --set expression
    n_tok=size(tokens) and requeued through the exactly-once engine under
    a fresh batch id. Requeued events keep their ORIGINAL LSNs, so the
    oracle is simply the global LWW over the CORRECTED stream — wherever
    a poisoned event was the true winner, the requeue must land it; where
    it was superseded meanwhile, the requeue must lose by version."""
    from pyspark.sql import types as T

    from rap_etl_spark.engine import CdcEngine, requeue_quarantine
    from rap_etl_spark.lake import ManifestParquetTable

    k = F.col("o_orderkey")
    tokens = F.when(
        k % 7 == 3, F.lit(None).cast("array<int>")
    ).otherwise(
        F.when(
            k % 2 == 1,
            F.array((k % 50).cast("int"), (F.col("o_custkey") % 50).cast("int")),
        ).otherwise(F.array((k % 50).cast("int")))
    )
    n_tok_declared = F.when(k % 7 == 3, F.lit(None).cast("int")).otherwise(
        F.when(k % 3 == 0, F.lit(99)).otherwise(
            (F.lit(1) + (k % 2)).cast("int")
        )
    )
    ev = _t(spark, sf, "orders").select(
        F.when(k % 7 == 3, "D").otherwise("U").alias("op"),
        F.col("o_custkey").cast("string").alias("doc_id"),
        k.cast("long").alias("lsn"),
        tokens.alias("tokens"),
        n_tok_declared.alias("n_tok"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="rap-etl-requeue-")
    try:
        t = ManifestParquetTable.create(
            spark, os.path.join(work, "t"), schema, n_buckets=8
        )
        eng = CdcEngine(spark, t, quarantine_dir=os.path.join(work, "dlq"))
        eng.apply_batch(ev, batch_id=0)
        requeue_quarantine(
            spark,
            eng,
            os.path.join(work, "dlq"),
            batch_id=100,
            fixes={"n_tok": "size(tokens)"},
        )
        rows = t.read().select("doc_id", "lsn", "n_tok").collect()
        out = T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("n_tok", T.IntegerType()),
            ]
        )
        return spark.createDataFrame(rows, out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CONNECTOR_QUERIES["cdc_requeue"] = q_cdc_requeue

CONNECTOR_ORACLES["cdc_requeue"] = (
    # global LWW over the CORRECTED stream: n_tok = true token count
    "WITH ev AS (SELECT"
    "  CASE WHEN o_orderkey % 7 = 3 THEN 'D' ELSE 'U' END AS op,"
    "  CAST(o_custkey AS VARCHAR) AS doc_id,"
    "  o_orderkey AS lsn,"
    "  CASE WHEN o_orderkey % 7 = 3 THEN NULL"
    "   ELSE CAST(1 + o_orderkey % 2 AS INTEGER) END AS n_tok"
    "  FROM orders),"
    " w AS (SELECT *, row_number() OVER"
    "  (PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM ev)"
    " SELECT doc_id, lsn, n_tok FROM w WHERE rn = 1 AND op <> 'D'"
)
