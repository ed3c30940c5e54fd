"""Incremental aggregate maintenance (operators/incremental.py): signed
delta folding must equal recomputation, including group birth/death."""

from pyspark.sql import functions as F

from rap_etl_spark.operators.incremental import agg_delta, apply_agg_delta, maintain


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "grp int, val long, _change_type string"
    )


def _agg(spark, rows):
    return spark.createDataFrame(rows, "grp int, n long, val long")


def test_delta_signs(spark):
    ch = _changes(
        spark,
        [
            (1, 10, "insert"),
            (1, 3, "update_preimage"),
            (1, 7, "update_postimage"),
            (2, 5, "delete"),
        ],
    )
    d = {r["grp"]: r for r in agg_delta(ch, ["grp"], ["val"]).collect()}
    assert d[1]["_dn"] == 1 and d[1]["val"] == 14  # +10 -3 +7
    assert d[2]["_dn"] == -1 and d[2]["val"] == -5


def test_group_birth_and_death(spark):
    base = _agg(spark, [(1, 2, 100), (2, 1, 5)])
    ch = _changes(
        spark,
        [
            (2, 5, "delete"),      # group 2 dies (n -> 0)
            (3, 9, "insert"),      # group 3 born
        ],
    )
    out = {r["grp"]: r for r in maintain(base, ch, ["grp"], ["val"]).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n"] == 2 and out[1]["val"] == 100  # untouched survives
    assert out[3]["n"] == 1 and out[3]["val"] == 9


def test_null_group_key(spark):
    base = _agg(spark, [(None, 1, 4)])
    ch = _changes(spark, [(None, 6, "insert")])
    out = maintain(base, ch, ["grp"], ["val"]).collect()
    assert len(out) == 1
    assert out[0]["n"] == 2 and out[0]["val"] == 10  # eqNullSafe join matched


def test_matches_recomputation(spark):
    rows = [(i % 4, i, "insert") for i in range(40)]
    ch1 = _changes(spark, rows[:25])
    ch2 = _changes(spark, rows[25:])
    empty = _agg(spark, [])
    a1 = maintain(empty, ch1, ["grp"], ["val"])
    a2 = maintain(a1, ch2, ["grp"], ["val"])
    full = (
        _changes(spark, rows)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("val"))
    )
    assert sorted(map(tuple, a2.collect())) == sorted(map(tuple, full.collect()))


# --------------------------------------------------------------------------
# join-view IVM (maintain_join_view)
# --------------------------------------------------------------------------
def _fact(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, fk int, val long")


def _fact_changes(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, fk int, val long, _change_type string"
    )


def _dim(spark):
    return spark.createDataFrame(
        [(1, "red"), (2, "blue"), (3, "green")], "dk int, color string"
    )


def _join_view(spark, fact):
    from pyspark.sql import functions as F2

    return fact.join(_dim(spark), F2.col("fk") == F2.col("dk"), "inner").select(
        "doc_id", "fk", "val", "color"
    )


def test_maintain_join_view_matches_recompute(spark):
    from pyspark.sql import functions as F2

    from rap_etl_spark.operators.incremental import maintain_join_view

    old = [("a", 1, 10), ("b", 2, 20), ("c", 3, 30), ("d", 9, 40)]  # d: no dim
    view = _join_view(spark, _fact(spark, old))
    # batch: update a (fk flips 1->2), delete b, insert e, touch-null-dim f
    ch = _fact_changes(
        spark,
        [
            ("a", 1, 10, "update_preimage"),
            ("a", 2, 11, "update_postimage"),
            ("b", 2, 20, "delete"),
            ("e", 3, 50, "insert"),
            ("f", 9, 60, "insert"),
        ],
    )
    new_fact = _fact(
        spark, [("a", 2, 11), ("c", 3, 30), ("d", 9, 40), ("e", 3, 50), ("f", 9, 60)]
    )
    maintained = maintain_join_view(
        view, ch, _dim(spark), key="doc_id", on=F2.col("fk") == F2.col("dk")
    )
    expect = _join_view(spark, new_fact)
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_maintain_join_view_left_outer(spark):
    from pyspark.sql import functions as F2

    from rap_etl_spark.operators.incremental import maintain_join_view

    fact = _fact(spark, [("a", 1, 10), ("d", 9, 40)])
    dim = _dim(spark)
    view = fact.join(dim, F2.col("fk") == F2.col("dk"), "left").select(
        "doc_id", "fk", "val", "color"
    )
    ch = _fact_changes(spark, [("z", 8, 70, "insert")])  # another no-match key
    maintained = maintain_join_view(
        view, ch, dim, key="doc_id", on=F2.col("fk") == F2.col("dk"), how="left"
    )
    got = {r["doc_id"]: r["color"] for r in maintained.collect()}
    assert got == {"a": "red", "d": None, "z": None}


# --------------------------------------------------------------------------
# MIN/MAX IVM (maintain_minmax) — the non-distributive class
# --------------------------------------------------------------------------
def _mm_base(spark):
    # g1: {1, 5, 9}, g2: {10, 20}
    fact = spark.createDataFrame(
        [("g1", 1), ("g1", 5), ("g1", 9), ("g2", 10), ("g2", 20)],
        ["grp", "v"],
    )
    base = fact.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    return fact, base


def test_minmax_insert_only_closed_form(spark):
    from rap_etl_spark.operators.incremental import maintain_minmax

    fact, base = _mm_base(spark)
    ch = spark.createDataFrame(
        [("g1", 0, "insert"), ("g2", 15, "insert")],
        ["grp", "v", "_change_type"],
    )
    fact2 = fact.union(ch.select("grp", "v"))
    out = {
        r["grp"]: r
        for r in maintain_minmax(base, ch, fact2, ["grp"], "v").collect()
    }
    assert (out["g1"]["min_v"], out["g1"]["max_v"], out["g1"]["n"]) == (0, 9, 4)
    assert (out["g2"]["min_v"], out["g2"]["max_v"], out["g2"]["n"]) == (10, 20, 3)


def test_minmax_delete_of_extremum_reaggregates(spark):
    from rap_etl_spark.operators.incremental import maintain_minmax

    fact, base = _mm_base(spark)
    # delete g1's max (9): second-largest (5) is NOT in the aggregate state,
    # so only a fact re-agg of g1 can produce it. g2 untouched.
    ch = spark.createDataFrame(
        [("g1", 9, "delete")], ["grp", "v", "_change_type"]
    )
    fact2 = fact.filter(~((F.col("grp") == "g1") & (F.col("v") == 9)))
    out = {
        r["grp"]: r
        for r in maintain_minmax(base, ch, fact2, ["grp"], "v").collect()
    }
    assert (out["g1"]["min_v"], out["g1"]["max_v"], out["g1"]["n"]) == (1, 5, 2)
    assert (out["g2"]["min_v"], out["g2"]["max_v"]) == (10, 20)


def test_minmax_interior_delete_stays_closed_form(spark):
    from rap_etl_spark.operators.incremental import maintain_minmax

    fact, base = _mm_base(spark)
    # delete g1's interior value (5): extremum untouched -> clean path
    ch = spark.createDataFrame(
        [("g1", 5, "delete")], ["grp", "v", "_change_type"]
    )
    fact2 = fact.filter(~((F.col("grp") == "g1") & (F.col("v") == 5)))
    out = {
        r["grp"]: r
        for r in maintain_minmax(base, ch, fact2, ["grp"], "v").collect()
    }
    assert (out["g1"]["min_v"], out["g1"]["max_v"], out["g1"]["n"]) == (1, 9, 2)


def test_minmax_update_new_group_and_group_death(spark):
    from rap_etl_spark.operators.incremental import maintain_minmax

    fact, base = _mm_base(spark)
    # update g2's 20 -> 25 (pre+post images), birth g3, kill g1 entirely
    ch = spark.createDataFrame(
        [
            ("g2", 20, "update_preimage"),
            ("g2", 25, "update_postimage"),
            ("g3", 7, "insert"),
            ("g1", 1, "delete"),
            ("g1", 5, "delete"),
            ("g1", 9, "delete"),
        ],
        ["grp", "v", "_change_type"],
    )
    fact2 = spark.createDataFrame(
        [("g2", 10), ("g2", 25), ("g3", 7)], ["grp", "v"]
    )
    out = {
        r["grp"]: r
        for r in maintain_minmax(base, ch, fact2, ["grp"], "v").collect()
    }
    assert "g1" not in out  # count reached 0
    assert (out["g2"]["min_v"], out["g2"]["max_v"], out["g2"]["n"]) == (10, 25, 2)
    assert (out["g3"]["min_v"], out["g3"]["max_v"], out["g3"]["n"]) == (7, 7, 1)


# --------------------------------------------------------------------------
# TOP-K IVM (maintain_topk) — the order-statistic class
# --------------------------------------------------------------------------
def _tk_state(spark, fact, k=2):
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("v").desc(), F.col("id").asc())
    return (
        fact.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _tk_fact(spark, rows):
    return spark.createDataFrame(rows, "grp string, id string, v long")


def _tk_ch(spark, rows):
    return spark.createDataFrame(rows, "grp string, id string, v long, _change_type string")


def _tk_run(spark, fact_rows, ch_rows, fact2_rows, k=2):
    from rap_etl_spark.operators.incremental import maintain_topk

    fact = _tk_fact(spark, fact_rows)
    fact2 = _tk_fact(spark, fact2_rows)
    out = maintain_topk(
        _tk_state(spark, fact, k), _tk_ch(spark, ch_rows), fact2,
        ["grp"], "v", "id", k,
    )
    return {(r["grp"], r["id"], r["v"]) for r in out.collect()}


def _tk_expect(spark, fact2_rows, k=2):
    return {
        (r["grp"], r["id"], r["v"])
        for r in _tk_state(spark, _tk_fact(spark, fact2_rows), k).collect()
    }


def test_topk_insert_only_closed_form(spark):
    fact = [("g1", "a", 10), ("g1", "b", 8), ("g1", "c", 5)]
    ch = [("g1", "d", 9, "insert"), ("g1", "e", 1, "insert")]
    fact2 = fact + [("g1", "d", 9), ("g1", "e", 1)]
    assert _tk_run(spark, fact, ch, fact2) == _tk_expect(spark, fact2)


def test_topk_delete_inside_topk_reaggregates(spark):
    # removing the stored #1 must surface c (not in state) from the fact
    fact = [("g1", "a", 10), ("g1", "b", 8), ("g1", "c", 5)]
    ch = [("g1", "a", 10, "delete")]
    fact2 = [("g1", "b", 8), ("g1", "c", 5)]
    assert _tk_run(spark, fact, ch, fact2) == _tk_expect(spark, fact2)


def test_topk_delete_below_floor_stays_closed_form(spark):
    fact = [("g1", "a", 10), ("g1", "b", 8), ("g1", "c", 5)]
    ch = [("g1", "c", 5, "delete")]
    fact2 = [("g1", "a", 10), ("g1", "b", 8)]
    assert _tk_run(spark, fact, ch, fact2) == _tk_expect(spark, fact2)


def test_topk_update_new_group_small_group_and_death(spark):
    # g1: update moves a row's value; g2 has < k rows (whole group stored,
    # removal must re-derive); g3 is born; g4-style death via all-removed
    fact = [
        ("g1", "a", 10), ("g1", "b", 8), ("g1", "c", 5),
        ("g2", "x", 3),
    ]
    ch = [
        ("g1", "b", 8, "update_preimage"),
        ("g1", "b", 12, "update_postimage"),
        ("g2", "x", 3, "delete"),
        ("g3", "n", 7, "insert"),
    ]
    fact2 = [("g1", "a", 10), ("g1", "b", 12), ("g1", "c", 5), ("g3", "n", 7)]
    assert _tk_run(spark, fact, ch, fact2) == _tk_expect(spark, fact2)


def test_topk_tie_break_deterministic(spark):
    # equal values: id asc decides membership identically in both paths
    fact = [("g1", "b", 5), ("g1", "c", 5), ("g1", "d", 5)]
    ch = [("g1", "a", 5, "insert")]
    fact2 = fact + [("g1", "a", 5)]
    assert _tk_run(spark, fact, ch, fact2) == _tk_expect(spark, fact2)


def test_topk_matches_recompute_randomized(spark):
    import random

    rnd = random.Random(47)
    fact_rows = [
        (f"g{rnd.randrange(6)}", f"id{i}", rnd.randrange(100))
        for i in range(120)
    ]
    # derive a change stream: delete 25 random rows, update 25, insert 30
    pool = list(fact_rows)
    rnd.shuffle(pool)
    dels, upds, keeps = pool[:25], pool[25:50], pool[50:]
    ch = [(g, i, v, "delete") for g, i, v in dels]
    upd2 = []
    for g, i, v in upds:
        nv = rnd.randrange(100)
        ch += [(g, i, v, "update_preimage"), (g, i, nv, "update_postimage")]
        upd2.append((g, i, nv))
    ins = [
        (f"g{rnd.randrange(8)}", f"new{i}", rnd.randrange(100))
        for i in range(30)
    ]
    ch += [(g, i, v, "insert") for g, i, v in ins]
    fact2 = keeps + upd2 + ins
    assert _tk_run(spark, fact_rows, ch, fact2, k=3) == _tk_expect(
        spark, fact2, k=3
    )


# --------------------------------------------------------------------------
# COUNT(DISTINCT) IVM (maintain_count_distinct) — refcount state
# --------------------------------------------------------------------------
def test_count_distinct_fold_and_drop(spark):
    from rap_etl_spark.operators.incremental import maintain_count_distinct

    state = spark.createDataFrame(
        [("g1", "a", 2), ("g1", "b", 1), ("g2", "x", 1)],
        "grp string, v string, _refcount long",
    )
    ch = spark.createDataFrame(
        [
            ("g1", "a", "delete"),          # refcount 2 -> 1: still distinct
            ("g1", "b", "delete"),          # refcount 1 -> 0: drops
            ("g1", "c", "insert"),          # new value
            ("g2", "x", "update_preimage"),
            ("g2", "y", "update_postimage"),  # x -> y: count stays 1
            ("g3", "z", "insert"),          # new group
        ],
        "grp string, v string, _change_type string",
    )
    new_state, counts = maintain_count_distinct(state, ch, ["grp"], "v")
    st = {(r["grp"], r["v"]): r["_refcount"] for r in new_state.collect()}
    assert st == {("g1", "a"): 1, ("g1", "c"): 1, ("g2", "y"): 1, ("g3", "z"): 1}
    cn = {r["grp"]: r["n_distinct"] for r in counts.collect()}
    assert cn == {"g1": 2, "g2": 1, "g3": 1}


def test_count_distinct_matches_recompute_randomized(spark):
    import random

    from rap_etl_spark.operators.incremental import maintain_count_distinct

    rnd = random.Random(11)
    base = [
        (f"g{rnd.randrange(4)}", f"v{rnd.randrange(12)}") for _ in range(80)
    ]
    fact = spark.createDataFrame(base, "grp string, v string")
    state = fact.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("_refcount"))
    pool = list(base)
    rnd.shuffle(pool)
    dels, keeps = pool[:30], pool[30:]
    ins = [(f"g{rnd.randrange(5)}", f"v{rnd.randrange(15)}") for _ in range(25)]
    ch = spark.createDataFrame(
        [(g, v, "delete") for g, v in dels]
        + [(g, v, "insert") for g, v in ins],
        "grp string, v string, _change_type string",
    )
    _, counts = maintain_count_distinct(state, ch, ["grp"], "v")
    got = {r["grp"]: r["n_distinct"] for r in counts.collect()}
    final = keeps + ins
    want: dict[str, set] = {}
    for g, v in final:
        want.setdefault(g, set()).add(v)
    assert got == {g: len(vs) for g, vs in want.items()}


# --------------------------------------------------------------------------
# Token-frequency IVM (maintain_token_stats) — tokens-payload special case
# --------------------------------------------------------------------------
def test_token_stats_signed_fold(spark):
    from rap_etl_spark.operators.incremental import maintain_token_stats

    stats = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 2)], "token int, freq long"
    )
    ch = spark.createDataFrame(
        [
            ([1, 2], "update_preimage"),   # -1, -2
            ([1, 4], "update_postimage"),  # +1, +4: net -2, +4
            ([3, 3], "delete"),            # 3 drops 2 -> 0: leaves stats
            ([5], "insert"),               # new token
        ],
        "tokens array<int>, _change_type string",
    )
    out = {r["token"]: r["freq"] for r in maintain_token_stats(stats, ch).collect()}
    assert out == {1: 3, 4: 1, 5: 1}


def test_token_stats_matches_recompute_randomized(spark):
    import random

    from rap_etl_spark.operators.incremental import maintain_token_stats

    rnd = random.Random(23)
    docs = {
        f"d{i}": [rnd.randrange(20) for _ in range(rnd.randrange(1, 6))]
        for i in range(40)
    }
    stats = (
        spark.createDataFrame(
            [(toks,) for toks in docs.values()], "tokens array<int>"
        )
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ch_rows = []
    final = dict(docs)
    ids = sorted(docs)
    rnd.shuffle(ids)
    for d in ids[:10]:  # delete
        ch_rows.append((docs[d], "delete"))
        del final[d]
    for d in ids[10:25]:  # update
        new = [rnd.randrange(25) for _ in range(rnd.randrange(1, 6))]
        ch_rows.append((docs[d], "update_preimage"))
        ch_rows.append((new, "update_postimage"))
        final[d] = new
    for i in range(12):  # insert
        new = [rnd.randrange(25) for _ in range(rnd.randrange(1, 6))]
        ch_rows.append((new, "insert"))
        final[f"n{i}"] = new
    ch = spark.createDataFrame(ch_rows, "tokens array<int>, _change_type string")
    got = {
        r["token"]: r["freq"]
        for r in maintain_token_stats(stats, ch).collect()
    }
    want: dict[int, int] = {}
    for toks in final.values():
        for t in toks:
            want[t] = want.get(t, 0) + 1
    assert got == want
