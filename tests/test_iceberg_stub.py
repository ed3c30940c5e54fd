"""IcebergTable backend contract, tested against a recording stub session.

No Iceberg jar exists in this sandbox (SURVEY.md §7.2), so the backend is
integration-only on a real catalog — but its SQL surface and exactly-once
ledger logic are pure driver-side code we can unit-test: MERGE shape,
TBLPROPERTIES ledger write/read-back, redelivery skip, schema evolution
DDL. The stub records every SQL statement and plays back catalog state.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from rap_etl_spark.lake import IcebergTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


class _Row(dict):
    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.values())[k]
        return dict.__getitem__(self, k)


class _Result:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows

    def first(self):
        return self._rows[0] if self._rows else None


class _StubSpark:
    """Replays just enough catalog behavior: snapshot ids advance on every
    write statement; SET TBLPROPERTIES persists; SHOW TBLPROPERTIES plays
    them back."""

    def __init__(self):
        self.sqls: list[str] = []
        self.props: dict[str, str] = {}
        self._snapshot = 100

    def table(self, ident):
        class _T:
            schema = SCHEMA

        return _T()

    def sql(self, q: str):
        qn = " ".join(q.split())
        self.sqls.append(qn)
        if qn.startswith("MERGE INTO"):
            self._snapshot += 1
            return _Result([])
        if "SET TBLPROPERTIES" in qn:
            # parse ('key' = 'value')
            frag = qn.split("SET TBLPROPERTIES", 1)[1].strip().strip("()")
            k, v = frag.split("=", 1)
            self.props[k.strip().strip("'")] = (
                v.strip().strip("'").replace("''", "'")
            )
            self._snapshot += 1
            return _Result([])
        if qn.startswith("SHOW TBLPROPERTIES"):
            return _Result([_Row(key=k, value=v) for k, v in self.props.items()])
        if "FROM" in qn and ".snapshots" in qn:
            return _Result([_Row(snapshot_id=self._snapshot)])
        if qn.startswith("ALTER TABLE"):
            self._snapshot += 1
            return _Result([])
        raise AssertionError(f"unexpected sql: {qn}")


class _StubChanges:
    def __init__(self, n=3):
        self._n = n

    def createOrReplaceTempView(self, name):
        pass

    def count(self):
        return self._n


def test_merge_writes_ledger_and_skips_redelivery():
    spark = _StubSpark()
    t = IcebergTable(spark, "cat.db.docs")
    info = t.merge(_StubChanges(5), batch_id=7)
    assert not info.skipped and info.rows_written == 5
    merges = [q for q in spark.sqls if q.startswith("MERGE INTO")]
    assert len(merges) == 1
    m = merges[0]
    assert "WHEN MATCHED AND s.op = 'D' THEN DELETE" in m
    assert "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT" in m
    assert "t.doc_id = s.doc_id" in m
    # ledger entry persisted with snapshot + rows
    ledger = t.committed_batches()
    assert set(ledger) == {"7"}
    assert ledger["7"]["event_count"] == 5
    assert str(ledger["7"]["snapshot_id"]) == str(info.snapshot_id)
    assert t.is_committed(7) and not t.is_committed(8)

    # redelivery: metadata-only no-op — no second MERGE issued
    info2 = t.merge(_StubChanges(5), batch_id=7)
    assert info2.skipped and info2.rows_written == 0
    assert len([q for q in spark.sqls if q.startswith("MERGE INTO")]) == 1


def test_merge_without_batch_id_writes_no_ledger():
    spark = _StubSpark()
    t = IcebergTable(spark, "cat.db.docs")
    t.merge(_StubChanges(2), batch_id=None)
    assert t.committed_batches() == {}


def test_ledger_json_is_sql_escaped():
    spark = _StubSpark()
    t = IcebergTable(spark, "cat.db.docs")
    t.merge(_StubChanges(1), batch_id=1)
    set_stmt = [q for q in spark.sqls if "SET TBLPROPERTIES" in q][0]
    # the JSON value contains double quotes only; embedded single quotes
    # would have been doubled — round-trip through the stub's unescape
    entry = t.committed_batches()["1"]
    assert json.dumps(entry)  # parses back to JSON cleanly


def test_evolve_emits_add_and_widen_ddl():
    spark = _StubSpark()
    t = IcebergTable(spark, "cat.db.docs")
    new_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    t.evolve(new_schema)
    alters = [q for q in spark.sqls if q.startswith("ALTER TABLE")]
    assert any("ADD COLUMN lang string" in q for q in alters)
    assert any("ALTER COLUMN n_tok TYPE bigint" in q for q in alters)
