"""Ingest-path curation (VERDICT r1 item 9): near-duplicate payloads are
dropped from each batch's winner delta BEFORE the merge, so planted dups
never reach the table — composing neardup.dedup_batch_tokens into
CdcEngine.apply_batch via dedup_policy."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rap_etl_spark.engine import CdcEngine
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.operators.neardup import dedup_batch_tokens
from rap_etl_spark.schemas import DOCS_SCHEMA, EVENTS_SCHEMA

TS = dt.datetime(2026, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [(op, d, lsn, toks, len(toks) if toks else None, src, TS)
         for (op, d, lsn, toks, src) in rows],
        EVENTS_SCHEMA,
    )


def test_dedup_batch_tokens_exact(spark):
    df = _events(
        spark,
        [
            ("I", "a", 1, [1, 2, 3], "s"),
            ("I", "b", 2, [1, 2, 3], "s"),   # exact dup of a -> dropped
            ("I", "c", 3, [9, 9], "s"),
            ("D", "d", 4, None, None),        # delete must pass through
        ],
    )
    out = dedup_batch_tokens(df, policy="exact")
    got = {r["doc_id"] for r in out.collect()}
    assert got == {"a", "c", "d"}


def test_dedup_batch_tokens_minhash_drops_neardups(spark):
    base = list(range(100))
    near = base[:95] + [999, 998, 997, 996, 995]  # ~90% shingle overlap
    far = [7 * i + 3 for i in range(100)]
    df = _events(
        spark,
        [
            ("I", "a", 1, base, "s"),
            ("I", "b", 2, near, "s"),   # near-dup of a -> dropped (rep = min key)
            ("I", "c", 3, far, "s"),
        ],
    )
    out = dedup_batch_tokens(df, policy="minhash", threshold=0.5)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {"a", "c"}


def test_engine_dedup_policy_keeps_neardups_out_of_table(spark, tmp_path):
    """End-to-end: a replayed batch with planted exact-dup payloads lands
    only the representatives; LWW and delete semantics are unaffected."""
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    eng = CdcEngine(spark, t, dedup_policy="exact", count_input=False)
    b0 = _events(
        spark,
        [
            ("I", "doc-1", 10, [5, 5, 5], "s"),
            ("I", "doc-2", 11, [5, 5, 5], "s"),   # dup payload -> never lands
            ("I", "doc-3", 12, [1, 2], "s"),
            ("U", "doc-3", 13, [1, 2, 3], "s"),   # LWW winner within batch
        ],
    )
    eng.apply_batch(b0, batch_id=0)
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert set(got) == {"doc-1", "doc-3"}
    assert got["doc-3"]["tokens"] == [1, 2, 3]

    # later batch: delete passes the filter, unique payload upserts
    b1 = _events(
        spark,
        [
            ("D", "doc-1", 20, None, None),
            ("U", "doc-3", 21, [8, 8, 8], "s"),
        ],
    )
    eng.apply_batch(b1, batch_id=1)
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert set(got) == {"doc-3"}
    assert got["doc-3"]["tokens"] == [8, 8, 8]


def test_engine_dedup_policy_minhash_end_to_end(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    eng = CdcEngine(spark, t, dedup_policy="minhash", count_input=False)
    base = list(range(60))
    near = base[:57] + [901, 902, 903]
    rows = [
        ("I", "doc-a", 1, base, "s"),
        ("I", "doc-b", 2, near, "s"),     # near-dup -> dropped at ingest
        ("I", "doc-c", 3, [3 * i for i in range(40)], "s"),
    ]
    eng.apply_batch(_events(spark, rows), batch_id=0)
    got = sorted(r["doc_id"] for r in t.read().collect())
    assert got == ["doc-a", "doc-c"]


def test_dedup_policy_off_by_default(spark, tmp_path):
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    eng = CdcEngine(spark, t, count_input=False)
    rows = [
        ("I", "doc-1", 1, [1, 2], "s"),
        ("I", "doc-2", 2, [1, 2], "s"),
    ]
    eng.apply_batch(_events(spark, rows), batch_id=0)
    assert t.read().count() == 2  # duplicates allowed when curation is off


def test_minhash_tokens_signature_matches_text_core(spark):
    """Token-shingle signatures agree between two frames with identical
    token arrays (cross-frame determinism of the shared kernel)."""
    from rap_etl_spark.operators.neardup import minhash_signatures_tokens

    rows = [("x", list(range(30))), ("y", [5, 4, 3]), ("z", [])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    s1 = {r["doc_id"]: list(r["signature"]) for r in minhash_signatures_tokens(df, n_hashes=16).collect()}
    df2 = spark.createDataFrame(list(reversed(rows)), "doc_id string, tokens array<int>")
    s2 = {r["doc_id"]: list(r["signature"]) for r in minhash_signatures_tokens(df2, n_hashes=16).collect()}
    assert s1 == s2
    assert len(s1["x"]) == 16


def test_neardup_tokens_high_overlap_agree(spark):
    """Signature agreement tracks token-shingle Jaccard: a 95%-overlap pair
    agrees on most hashes, a disjoint pair on almost none."""
    from rap_etl_spark.operators.neardup import minhash_signatures_tokens

    base = list(range(200))
    near = base[:190] + [10_000 + i for i in range(10)]
    far = [91_000 + i for i in range(200)]
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", far)],
        "doc_id string, tokens array<int>",
    )
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures_tokens(df).collect()}
    agree_ab = sum(x == y for x, y in zip(sigs["a"], sigs["b"])) / 64
    agree_ac = sum(x == y for x, y in zip(sigs["a"], sigs["c"])) / 64
    assert agree_ab >= 0.6
    assert agree_ac <= 0.15


def test_lineage_unaffected_by_dedup(spark, tmp_path):
    """Lineage still records the SOURCE offset range (pre-filter), so audit
    covers every delivered event even when curation drops payloads."""
    t = ManifestParquetTable.create(spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=8)
    eng = CdcEngine(
        spark, t, dedup_policy="exact", lineage_dir=str(tmp_path / "lin")
    )
    rows = [
        ("I", "doc-1", 100, [1], "s"),
        ("I", "doc-2", 101, [1], "s"),  # dropped by curation
    ]
    eng.apply_batch(_events(spark, rows), batch_id=0)
    lin = eng.read_lineage().agg(
        F.min("lsn_min").alias("lo"), F.max("lsn_max").alias("hi"),
        F.sum("rows_applied").alias("n")
    ).first()
    assert (lin["lo"], lin["hi"], lin["n"]) == (100, 101, 2)
    assert t.read().count() == 1


def test_drop_existing_payloads_unit(spark):
    from rap_etl_spark.operators.neardup import drop_existing_payloads

    corpus = spark.createDataFrame(
        [("x", [1, 2, 3]), ("y", [4, 5])], "doc_id string, tokens array<int>"
    )
    delta = _events(
        spark,
        [
            ("I", "a", 1, [1, 2, 3], "s"),  # exists under x -> dropped
            ("I", "b", 2, [6, 7], "s"),     # new payload -> kept
            ("U", "x", 3, [1, 2, 3], "s"),  # SAME key re-sends payload -> kept
            ("D", "y", 4, None, None),       # delete always passes
        ],
    )
    out = drop_existing_payloads(delta, corpus)
    assert {r["doc_id"] for r in out.collect()} == {"b", "x", "y"}


def test_engine_exact_global_keeps_cross_batch_dups_out(spark, tmp_path):
    """Batch 0 lands payload P under key a; batch 1 re-sends P under a NEW
    key -> with dedup_policy="exact-global" it never reaches the table,
    while genuinely new payloads and same-key updates do."""
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), DOCS_SCHEMA, n_buckets=4
    )
    eng = CdcEngine(spark, t, dedup_policy="exact-global")
    eng.apply_batch(
        _events(spark, [("I", "a", 1, [1, 2, 3], "s"),
                        ("I", "b", 2, [4, 5], "s")]),
        batch_id=0,
    )
    eng.apply_batch(
        _events(spark, [("I", "c", 3, [1, 2, 3], "s"),   # cross-batch dup
                        ("I", "d", 4, [6, 7, 8], "s"),   # new payload
                        ("U", "a", 5, [1, 2, 3], "s")]), # same-key resend
        batch_id=1,
    )
    got = {r["doc_id"]: list(r["tokens"]) for r in t.read().collect()}
    assert set(got) == {"a", "b", "d"}
    assert got["a"] == [1, 2, 3] and got["d"] == [6, 7, 8]
