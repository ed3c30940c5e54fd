"""Materialized views with incremental refresh (X92, rap_etl_spark/mv.py).

Each test drives the REAL pipeline: change batches through CdcEngine into
a lake table, then MV refreshes from the table's changefeed — and checks
the view equals the full recompute of its definition query at the
table's head snapshot (the IVM correctness contract)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.engine import CdcEngine
from rap_etl_spark.lake import ManifestParquetTable
from rap_etl_spark.mv import MV_FILE, MaterializedView

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, doc_id string, lsn long, grp string, val long"
    )


def _setup(spark, tmp_path):
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4
    )
    eng = CdcEngine(spark, t)
    b0 = [
        ("I", f"d{i}", i, "a" if i % 2 == 0 else "b", i * 10) for i in range(20)
    ]
    eng.apply_batch(_batch(spark, b0), batch_id=0)
    return t, eng


def _full_agg(t):
    return (
        t.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("val"))
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_agg_mv_create_refresh_matches_full(spark, tmp_path):
    t, eng = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]},
    )
    assert _rows(mv.read()) == _rows(_full_agg(t))

    # updates move keys between groups, deletes remove rows, inserts add a
    # brand-new group — every delta class in one batch
    b1 = (
        [("U", f"d{i}", 100 + i, "c", i * 7) for i in range(0, 6)]
        + [("D", f"d{i}", 200 + i, None, None) for i in range(6, 10)]
        + [("I", f"x{i}", 300 + i, "d", i) for i in range(3)]
    )
    eng.apply_batch(_batch(spark, b1), batch_id=1)
    info = mv.refresh()
    assert not info.skipped and not info.full_recompute
    assert info.version == 2 and info.to_snapshot == t.snapshot_id()
    assert _rows(mv.read()) == _rows(_full_agg(t))

    # second batch, second incremental refresh: cursor chains correctly
    b2 = [("D", "x0", 400, None, None), ("U", "d15", 401, "a", 999)]
    eng.apply_batch(_batch(spark, b2), batch_id=2)
    assert not mv.refresh().skipped
    assert _rows(mv.read()) == _rows(_full_agg(t))


def test_refresh_is_noop_when_base_unchanged(spark, tmp_path):
    t, _ = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]},
    )
    info = mv.refresh()
    assert info.skipped and info.version == 1
    assert mv.cursor() == t.snapshot_id()


def test_minmax_mv_extremum_delete_takes_dirty_path(spark, tmp_path):
    t, eng = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "minmax", "group_cols": ["grp"], "val_col": "val"},
    )
    # d18 holds group a's max (180), d19 group b's max (190): deleting both
    # forces the dirty-group re-aggregation, not the closed form
    b1 = [("D", "d18", 500, None, None), ("D", "d19", 501, None, None)]
    eng.apply_batch(_batch(spark, b1), batch_id=1)
    assert not mv.refresh().skipped
    want = _rows(
        t.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("val").alias("min_v"),
            F.max("val").alias("max_v"),
        )
    )
    assert _rows(mv.read()) == want


def test_crash_before_commit_is_idempotent(spark, tmp_path, monkeypatch):
    """The pointer swap is the commit: kill the refresh after the v2 data
    write but before the swap — the view still reads v1, and the retried
    refresh re-runs the SAME delta (cursor never advanced) and lands
    correctly."""
    t, eng = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]},
    )
    eng.apply_batch(
        _batch(spark, [("U", "d0", 600, "z", 1)]), batch_id=1
    )
    v1_state = _rows(mv.read())
    boom = RuntimeError("crash before mv commit")
    monkeypatch.setattr(
        MaterializedView, "_commit", lambda *a, **k: (_ for _ in ()).throw(boom)
    )
    with pytest.raises(RuntimeError, match="crash before mv commit"):
        mv.refresh()
    monkeypatch.undo()
    # nothing visible changed: pointer still v1, reads serve the old state
    assert mv._meta()["version"] == 1
    assert _rows(mv.read()) == v1_state
    info = mv.refresh()  # retry converges
    assert info.version == 2
    assert _rows(mv.read()) == _rows(_full_agg(t))


def test_concurrent_refresh_loses_cleanly(spark, tmp_path):
    t, eng = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]},
    )
    eng.apply_batch(_batch(spark, [("I", "y0", 700, "q", 5)]), batch_id=1)
    # simulate a racing refresher that committed first
    p = os.path.join(mv.path, MV_FILE)
    meta = json.loads(mv.fs.read_text(p))
    meta["version"] = 7
    mv.fs.write_text_atomic(p, json.dumps(meta))
    with pytest.raises(RuntimeError, match="concurrent mv refresh"):
        mv._commit(dict(meta, version=2), expect_version=1)


def test_expired_cursor_falls_back_to_full_recompute(spark, tmp_path):
    t, eng = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]},
    )
    for b in (1, 2, 3):
        eng.apply_batch(
            _batch(spark, [("U", f"d{b}", 800 + b, "r", b)]), batch_id=b
        )
    # expire everything but the head: the MV cursor's snapshot is gone
    t.expire_snapshots(keep=1)
    info = mv.refresh()
    assert info.full_recompute and not info.skipped
    assert _rows(mv.read()) == _rows(_full_agg(t))


def test_load_and_gc(spark, tmp_path):
    t, eng = _setup(spark, tmp_path)
    path = str(tmp_path / "mv")
    MaterializedView.create(
        spark, path, t, {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]}
    )
    # reopen purely from disk (base path recorded in the commit file)
    mv = MaterializedView.load(spark, path)
    assert mv.base.path == t.path
    for b in (1, 2, 3):
        eng.apply_batch(
            _batch(spark, [("I", f"g{b}", 900 + b, "g", b)]), batch_id=b
        )
        mv.refresh()
    assert mv._meta()["version"] == 4
    live = sorted(os.listdir(os.path.join(path, "data")))
    # KEEP_VERSIONS=2 window enforced (dir names carry a uniqueness token)
    assert [n.split("-")[0] for n in live] == ["v3", "v4"]
    assert _rows(mv.read()) == _rows(_full_agg(t))


def test_cas_loser_never_touches_winner_state(spark, tmp_path):
    """Torn-state regression: a refresher that loses the version CAS has
    already written its state parquet BEFORE its commit is rejected. With
    a shared v{N} dir that write lands on top of the winner's LIVE data;
    unique per-attempt dir names make it an orphan instead, reaped by the
    next successful refresh's gc."""
    t, eng = _setup(spark, tmp_path)
    path = str(tmp_path / "mv")
    a = MaterializedView.create(
        spark, path, t, {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]}
    )
    eng.apply_batch(_batch(spark, [("I", "y0", 700, "q", 5)]), batch_id=1)
    b = MaterializedView.load(spark, path)
    assert b.refresh().version == 2  # the winner commits first
    winner = _rows(b.read())

    # the loser's refresh body, up to and including the doomed commit:
    # it computed SOME v2 state (stale here) and wrote it out already
    loser_dir = a._new_dirname(2)
    a._write_version(a.base.read().limit(3), loser_dir)
    with pytest.raises(RuntimeError, match="concurrent mv refresh"):
        a._commit(
            dict(a._meta(), version=2, data_dir=loser_dir), expect_version=1
        )
    # the winner's committed state is untouched by the loser's write
    assert _rows(b.read()) == winner
    # the orphan ages out of the KEEP_VERSIONS grace window: it is still
    # held at head=3 (it shares the previous version's slot) and is
    # reaped once the window moves past it at head=4
    for bid, ver in ((2, 3), (3, 4)):
        eng.apply_batch(
            _batch(spark, [("I", f"y{bid}", 700 + bid, "q", bid)]),
            batch_id=bid,
        )
        assert b.refresh().version == ver
    assert loser_dir not in os.listdir(os.path.join(path, "data"))
    assert _rows(b.read()) == _rows(_full_agg(t))


def test_bad_specs_rejected(spark, tmp_path):
    t, _ = _setup(spark, tmp_path)
    for spec in (
        {"kind": "nope", "group_cols": ["grp"]},
        {"kind": "agg", "group_cols": []},
        {"kind": "agg", "group_cols": ["grp"]},
        {"kind": "minmax", "group_cols": ["grp"]},
    ):
        with pytest.raises(ValueError):
            MaterializedView.create(spark, str(tmp_path / "bad"), t, spec)


def test_join_mv_matches_full(spark, tmp_path):
    """One-sided join IVM through the MV orchestration: fact changes
    (insert / cross-dim update / delete) replace exactly the changed
    keys' view rows; the fact table is never re-scanned."""
    t, eng = _setup(spark, tmp_path)
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("a", "alpha"), ("b", "beta"), ("c", "gamma"), ("d", "delta")],
        "g string, label string",
    ).write.parquet(dim_path)
    spec = {
        "kind": "join",
        "dim_path": dim_path,
        "fact_col": "grp",
        "dim_col": "g",
        "how": "inner",
        "select": ["doc_id", "val", "label"],
    }
    mv = MaterializedView.create(spark, str(tmp_path / "mv"), t, spec)

    def full():
        dim = spark.read.parquet(dim_path)
        return _rows(
            t.read()
            .join(dim, F.col("grp") == dim["g"], "inner")
            .select("doc_id", "val", "label")
        )

    assert _rows(mv.read()) == full()
    b1 = (
        [("U", "d0", 100, "c", 7)]          # moves between dim rows
        + [("U", "d1", 101, "zz", 8)]       # now matches NO dim row
        + [("D", "d2", 102, None, None)]    # delete drops the view row
        + [("I", "j0", 103, "d", 9)]        # brand-new key
    )
    eng.apply_batch(_batch(spark, b1), batch_id=1)
    info = mv.refresh()
    assert not info.skipped
    assert _rows(mv.read()) == full()


def test_join_mv_spec_validation(spark, tmp_path):
    t, _ = _setup(spark, tmp_path)
    with pytest.raises(ValueError, match="needs dim_path"):
        MaterializedView.create(
            spark, str(tmp_path / "bad"), t,
            {"kind": "join", "fact_col": "grp", "dim_col": "g",
             "select": ["doc_id"]},
        )
    with pytest.raises(ValueError, match="must include the table key"):
        MaterializedView.create(
            spark, str(tmp_path / "bad"), t,
            {"kind": "join", "dim_path": "/x", "fact_col": "grp",
             "dim_col": "g", "select": ["val"]},
        )
    with pytest.raises(ValueError, match="distinct fact_col/dim_col"):
        MaterializedView.create(
            spark, str(tmp_path / "bad"), t,
            {"kind": "join", "dim_path": "/x", "fact_col": "grp",
             "dim_col": "grp", "select": ["doc_id"]},
        )


def test_stream_tail_refreshes_mvs_per_microbatch(spark, tmp_path):
    """The DLT pipeline shape: a streaming tail keeps downstream MVs
    current — after the availableNow backlog drains, every MV sits at the
    table's head snapshot and equals its full recompute."""
    from rap_etl_spark.streaming.tail import stream_tail

    t, eng = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "agg", "group_cols": ["grp"], "sum_cols": ["val"]},
    )
    src = str(tmp_path / "src")
    b1 = [("U", f"d{i}", 1000 + i, "s", i) for i in range(5)] + [
        ("D", "d10", 1100, None, None)
    ]
    b2 = [("I", f"n{i}", 1200 + i, "t", i * 3) for i in range(4)]
    _batch(spark, b1).write.parquet(os.path.join(src, "f1"))
    _batch(spark, b2).write.parquet(os.path.join(src, "f2"))
    q = stream_tail(
        spark,
        src,
        str(tmp_path / "cp"),
        t,
        schema=_batch(spark, b1).schema,
        max_files_per_trigger=1,  # forces >=2 micro-batches
        mv_dirs=[str(tmp_path / "mv")],
    )
    q.awaitTermination()
    assert mv.cursor() == t._manifest(refresh=True)["snapshot_id"]
    assert _rows(mv.read()) == _rows(_full_agg(t))


def test_token_stats_mv_matches_full_explode(spark, tmp_path):
    """Tokens-axis MV: corpus-wide token frequencies maintained from the
    changefeed — the corpus is exploded exactly once (bootstrap); updates
    fold preimage tokens at -1 / postimage at +1, deletes retire counts,
    and vanished tokens drop out at freq 0."""
    tok_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    t = ManifestParquetTable.create(
        spark, str(tmp_path / "t"), tok_schema, n_buckets=4
    )
    eng = CdcEngine(spark, t)

    def tb(rows):
        return spark.createDataFrame(
            rows, "op string, doc_id string, lsn long, tokens array<int>"
        )

    eng.apply_batch(
        tb([("I", f"d{i}", i, [i % 3, i % 5, 7]) for i in range(12)]),
        batch_id=0,
    )
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {"kind": "token_stats", "tokens_col": "tokens"},
    )

    def full():
        return _rows(
            t.read()
            .select(F.explode("tokens").alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("freq"))
        )

    assert _rows(mv.read()) == full()
    # updates swap token contents (9991/9992 appear; some 7s vanish),
    # deletes retire whole docs' tokens
    b1 = (
        [("U", f"d{i}", 100 + i, [9991, i % 3]) for i in range(4)]
        + [("D", f"d{i}", 200 + i, None) for i in range(4, 7)]
        + [("I", "x0", 300, [9992])]
    )
    eng.apply_batch(tb(b1), batch_id=1)
    assert not mv.refresh().skipped
    assert _rows(mv.read()) == full()


def test_distinct_sketch_mv_matches_exact_in_coupon_regime(spark, tmp_path):
    """X102: per-group HLL distinct view. Small cardinalities sit in the
    sketch's exact (coupon) regime, so est must EQUAL the exact distinct
    count after every refresh — insert-only fold and the delete-dirty
    re-aggregation both."""
    t, eng = _setup(spark, tmp_path)
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        {
            "kind": "distinct_sketch",
            "group_cols": ["grp"],
            "val_col": "val",
            "lgk": 12,
        },
    )

    def exact():
        return {
            tuple(r)
            for r in t.read()
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct("val").alias("est"),
            )
            .collect()
        }

    def view():
        return {
            tuple(r)
            for r in mv.read().select("grp", "n", "est").collect()
        }

    assert view() == exact()
    # append-only batch: duplicate values on purpose (val repeats 0/10)
    eng.apply_batch(
        _batch(
            spark,
            [("I", f"n{i}", 100 + i, "a", (i % 2) * 10) for i in range(6)],
        ),
        batch_id=1,
    )
    info = mv.refresh()
    assert not info.skipped and not info.full_recompute
    assert view() == exact()
    # deletes + an update changing the sketched value: dirty path
    eng.apply_batch(
        _batch(
            spark,
            [
                ("D", "d0", 200, None, None),
                ("D", "d2", 201, None, None),
                ("U", "d4", 202, "a", 777),
            ],
        ),
        batch_id=2,
    )
    mv.refresh()
    assert view() == exact()
    # group death: remove every 'b' row
    eng.apply_batch(
        _batch(
            spark,
            [("D", f"d{i}", 300 + i, None, None) for i in range(1, 20, 2)],
        ),
        batch_id=3,
    )
    mv.refresh()
    assert view() == exact()
    assert {r["grp"] for r in mv.read().collect()} == {"a"}


def test_distinct_sketch_spec_validation(spark, tmp_path):
    t, _ = _setup(spark, tmp_path)
    with pytest.raises(ValueError, match="val_col"):
        MaterializedView.create(
            spark,
            str(tmp_path / "mv2"),
            t,
            {"kind": "distinct_sketch", "group_cols": ["grp"]},
        )
