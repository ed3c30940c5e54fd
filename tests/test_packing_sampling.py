"""Sequence packing (operators/packing.py) and deterministic
sampling/shuffle (operators/sampling.py) invariants."""

from pyspark.sql import functions as F

from rap_etl_spark.operators.packing import pack_sequences, packing_stats
from rap_etl_spark.operators.sampling import (
    deterministic_shuffle,
    stratified_sample_deterministic,
)

SEQ_LEN = 50


def _docs(spark, n=60, long_every=7):
    rows = []
    for i in range(n):
        ln = (i % 13) + 2
        if i % long_every == 0:
            ln = SEQ_LEN * 2 + 3  # forces chunking
        rows.append((f"d{i}", list(range(i, i + ln))))
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_pack_bounds_and_conservation(spark):
    docs = _docs(spark)
    packed = pack_sequences(docs, SEQ_LEN, num_partitions=4)
    rows = packed.collect()
    assert rows and all(0 < r["n_tok"] <= SEQ_LEN for r in rows)
    total_in = docs.select(F.sum(F.size("tokens"))).first()[0]
    assert sum(r["n_tok"] for r in rows) == total_in
    stats = packing_stats(packed, SEQ_LEN).first()
    assert stats["total_tokens"] == total_in
    assert stats["n_seqs"] == len(rows)


def test_pack_chunks_long_docs_in_order(spark):
    docs = spark.createDataFrame(
        [("big", list(range(SEQ_LEN * 2 + 5)))], "doc_id string, tokens array<int>"
    )
    rows = pack_sequences(docs, SEQ_LEN, num_partitions=1).collect()
    # pieces: 50, 50, 5 -> next-fit puts the two full pieces in their own
    # sequences and the tail joins the third
    flat = [t for r in sorted(rows, key=lambda r: int(r["seq_id"].split("-")[1]))
            for t in r["tokens"]]
    assert flat == list(range(SEQ_LEN * 2 + 5))  # order preserved
    assert all(r["doc_ids"] == ["big"] for r in rows)


def test_pack_deterministic(spark):
    docs = _docs(spark)
    a = pack_sequences(docs, SEQ_LEN, num_partitions=4).collect()
    b = pack_sequences(docs, SEQ_LEN, num_partitions=4).collect()
    key = lambda r: r["seq_id"]
    assert sorted(map(tuple, a), key=str) == sorted(map(tuple, b), key=str)
    del key


def test_stratified_deterministic_membership(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(300)], "doc_id long, source string"
    )
    pcts = {"src0": 80, "src1": 20}
    got = stratified_sample_deterministic(df, "doc_id", "source", pcts, 0)
    rows = got.collect()
    # membership is the pure predicate, checkable row by row
    for r in rows:
        p = pcts.get(r["source"], 0)
        assert r["doc_id"] % 100 < p
    # and complete: every qualifying row is present
    want = [
        (i, s) for i, s in [(i, f"src{i % 3}") for i in range(300)]
        if i % 100 < pcts.get(s, 0)
    ]
    assert sorted(map(tuple, rows)) == sorted(want)


def test_shuffle_deterministic_and_seeded(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(500)], "doc_id long, val string"
    )
    o1 = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=1).collect()]
    o1b = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=1).collect()]
    o2 = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=2).collect()]
    assert o1 == o1b                       # same seed: identical order
    assert o1 != o2                        # different seed: different order
    assert o1 != sorted(o1)                # actually shuffled
    assert sorted(o1) == sorted(o2) == list(range(500))  # a permutation


def test_mix_sources_repetition_semantics(spark):
    from rap_etl_spark.operators.sampling import mix_sources

    d = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id long, source string",
    )
    out = mix_sources(d, "doc_id", "source", {"a": 2.0, "b": 0.5})
    rows = out.collect()
    a = [r for r in rows if r["source"] == "a"]
    b = [r for r in rows if r["source"] == "b"]
    # weight 2.0: every 'a' row exactly twice (epochs 0 and 1)
    assert len(a) == 2000 and {r["epoch"] for r in a} == {0, 1}
    # weight 0.5: exactly the odd ids with id % 1000 < 500, epoch 0 only
    assert len(b) == 500 and all(r["epoch"] == 0 for r in b)
    assert all(r["doc_id"] % 1000 < 500 for r in b)
    # deterministic: identical on re-run
    again = sorted((r["doc_id"], r["epoch"]) for r in mix_sources(
        d, "doc_id", "source", {"a": 2.0, "b": 0.5}).collect())
    assert again == sorted((r["doc_id"], r["epoch"]) for r in rows)
