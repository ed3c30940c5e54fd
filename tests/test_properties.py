"""Property-based gates (SURVEY.md §5.2-6, hypothesis):

- pack/unpack is a bijection over arbitrary int32 token arrays;
- LWW final state is independent of event order and partitioning (the
  determinism property that makes replay-from-anywhere converge);
- schema evolution legality is exactly {same type, int32->int64 widening,
  float->double widening, nullable additions} and never narrowing/drops.

Spark round trips are expensive per example, so Spark-backed properties
use few, large examples; pure-Python properties (evolution rules, numpy
kernels) run the full default example budget.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from rap_etl_spark.lake import check_evolution
from tests.oracle import naive_final_state

# ---------- pure-python: pack/unpack numpy kernels ----------
tokens_arrays = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=64
        ),
    ),
    min_size=1,
    max_size=200,
)


@given(tokens_arrays)
@settings(max_examples=50, suppress_health_check=[HealthCheck.too_slow])
def test_pack_unpack_bijection_py(arrays):
    """The numpy pack/unpack pair (the heart of the pandas UDFs) round-trips
    any int32 array, including None, empty, and extreme values."""
    packed = [
        None if a is None else np.asarray(a, dtype="<i4").tobytes() for a in arrays
    ]
    back = [
        None if b is None else np.frombuffer(b, dtype="<i4").tolist() for b in packed
    ]
    want = [None if a is None else list(a) for a in arrays]
    assert back == want


# ---------- pure-python: LWW order-independence over the naive oracle ----------
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key index
        st.integers(min_value=0, max_value=50),  # lsn
        st.sampled_from(["I", "U", "D"]),
    ),
    min_size=1,
    max_size=60,
)


def _mk_events(triples):
    rows = []
    for k, lsn, op in triples:
        rows.append(
            {
                "doc_id": f"doc-{k}",
                "lsn": lsn,
                "op": op,
                "tokens": None if op == "D" else [k, lsn],
                "n_tok": None if op == "D" else 2,
                "source": None if op == "D" else f"s{k % 3}",
                "ingest_ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=lsn),
            }
        )
    return pd.DataFrame(rows)


@given(events_strategy, st.randoms())
@settings(max_examples=100, suppress_health_check=[HealthCheck.too_slow])
def test_naive_oracle_order_independent(triples, rng):
    """The reference semantics itself (naive oracle) must be a pure function
    of the event SET: shuffling delivery order never changes the final
    state. (The engine is separately asserted equivalent to this oracle in
    test_replay; together these give replay-order independence.)"""
    df = _mk_events(triples)
    shuffled = df.sample(frac=1.0, random_state=rng.randrange(2**31)).reset_index(
        drop=True
    )
    a = naive_final_state(df)
    b = naive_final_state(shuffled)
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------- pure-python: schema evolution legality ----------
_types = [
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.StringType(),
    T.ArrayType(T.IntegerType()),
    T.ArrayType(T.LongType()),
]


def _legal_widen(old: T.DataType, new: T.DataType) -> bool:
    if old == new:
        return True
    if isinstance(old, T.IntegerType) and isinstance(new, T.LongType):
        return True
    if isinstance(old, T.FloatType) and isinstance(new, T.DoubleType):
        return True
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return _legal_widen(old.elementType, new.elementType)
    return False


@given(
    st.lists(st.sampled_from(_types), min_size=1, max_size=4),
    st.lists(st.sampled_from(_types), min_size=1, max_size=4),
    st.booleans(),
)
@settings(max_examples=200)
def test_check_evolution_accepts_exactly_widenings(old_types, new_types, add_col):
    old = T.StructType(
        [T.StructField(f"c{i}", t, True) for i, t in enumerate(old_types)]
    )
    fields = [
        T.StructField(f"c{i}", t, True)
        for i, t in enumerate(new_types[: len(old_types)])
    ]
    # keep columns not mentioned in new_types (no drops — drops must raise)
    for i in range(len(new_types[: len(old_types)]), len(old_types)):
        fields.append(old.fields[i])
    if add_col:
        fields.append(T.StructField("added", T.StringType(), True))
    new = T.StructType(fields)

    should_pass = all(
        _legal_widen(o.dataType, n.dataType)
        for o, n in zip(old.fields, new.fields)
    )
    try:
        check_evolution(old, new)
        ok = True
    except ValueError:
        ok = False
    assert ok == should_pass, (old.simpleString(), new.simpleString())


def test_check_evolution_rejects_drops():
    old = T.StructType(
        [
            T.StructField("a", T.IntegerType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )
    new = T.StructType([T.StructField("a", T.IntegerType(), True)])
    try:
        check_evolution(old, new)
        raise AssertionError("drop accepted")
    except ValueError:
        pass


# ---------- spark-backed: engine LWW equals oracle on random event sets ----------
@given(events_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_engine_lww_matches_oracle_random_sets(spark, triples):
    from pyspark.sql import functions as F

    from rap_etl_spark.operators.cdc import lww_latest
    from rap_etl_spark.schemas import EVENTS_SCHEMA

    pdf = _mk_events(triples)
    # drop duplicate (doc_id,lsn) with conflicting payloads: the WAL
    # contract guarantees duplicate deliveries are byte-identical
    pdf = pdf.drop_duplicates(["doc_id", "lsn"], keep="last")
    sdf = spark.createDataFrame(pdf[list(EVENTS_SCHEMA.names)], EVENTS_SCHEMA)
    for strategy in ("window", "join", "maxby"):
        got = (
            lww_latest(sdf, strategy=strategy)
            .filter(F.col("op") != "D")
            .select("doc_id", "tokens", "n_tok", "source")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = naive_final_state(pdf).reset_index(drop=True)
        got["tokens"] = got["tokens"].map(lambda a: None if a is None else list(a))
        want_t = want.copy()
        want_t["tokens"] = want_t["tokens"].map(
            lambda a: None if a is None else list(a)
        )
        assert got["doc_id"].tolist() == want_t["doc_id"].tolist(), strategy
        assert got["tokens"].tolist() == want_t["tokens"].tolist(), strategy


# ---------- pure-python: vectorized minhash kernel vs its spec ----------
def _ref_minhash_sig(text: str, n_hashes: int, k: int, seed: int) -> np.ndarray:
    """Slow, per-shingle reference of the documented minhash spec
    (neardup.minhash_signatures): blake2b word hashes, degree-k rolling
    polynomial shingles, splitmix64-finalized xor family."""
    import hashlib

    from rap_etl_spark.operators import neardup as nd

    R = nd._hash_seeds(n_hashes, seed)
    C, M = int(nd._SHINGLE_C), 1 << 64

    def wh(w: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
        )

    words = text.split()
    if not words:
        shingle_sums = [int(nd._EMPTY_SHINGLE)]
    else:
        kk = min(k, len(words))
        shingle_sums = [
            sum(wh(words[j + t]) * pow(C, t, M) for t in range(kk)) % M
            for j in range(len(words) - kk + 1)
        ]
    sh = nd._mix64(np.array(shingle_sums, dtype=np.uint64))
    sig = np.empty(n_hashes, dtype=np.uint64)
    for i in range(n_hashes):
        sig[i] = nd._mix64(sh ^ R[i]).min()
    return sig.view(np.int64)


texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abcde é中")), max_size=80
    ),
    min_size=1,
    max_size=30,
)


@given(texts_strategy, st.integers(min_value=1, max_value=3))
@settings(max_examples=30, suppress_health_check=[HealthCheck.too_slow])
def test_minhash_kernel_matches_spec_and_batch_invariant(texts, n_chunks):
    """The vectorized kernel must (a) equal the per-shingle reference spec
    exactly and (b) give identical signatures under ANY batch split —
    the cross-executor determinism signatures rely on."""
    from rap_etl_spark.operators import neardup as nd

    n_hashes, k, seed = 8, 5, 42
    captured = {}

    class _BC:
        def __init__(self, v):
            self.value = v

    class _SC:
        def broadcast(self, v):
            return _BC(v)

    class _Sess:
        sparkContext = _SC()

    class _FakeDF:
        def __init__(self):
            self.sparkSession = _Sess()
            self.schema = T.StructType([T.StructField("doc_id", T.StringType())])

        def select(self, *a):
            return self

        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return self

    nd.minhash_signatures(_FakeDF(), n_hashes=n_hashes, shingle_k=k, seed=seed)
    fn = captured["fn"]
    pdf = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts}
    )
    whole = pd.concat(list(fn(iter([pdf])))).reset_index(drop=True)
    assert len(whole) == len(texts)
    for i, t in enumerate(texts):
        got = np.asarray(whole["signature"].iloc[i])
        want = _ref_minhash_sig(t, n_hashes, k, seed)
        assert np.array_equal(got, want), (i, t)
    # batch-split invariance
    chunks = [c.reset_index(drop=True) for c in np.array_split(pdf, n_chunks) if len(c)]
    split = pd.concat([pd.concat(list(fn(iter([c])))) for c in chunks]).reset_index(
        drop=True
    )
    for i in range(len(texts)):
        assert np.array_equal(
            np.asarray(split["signature"].iloc[i]),
            np.asarray(whole["signature"].iloc[i]),
        )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.text(
                # JSON-meaningful characters included on purpose: quotes,
                # backslashes, braces, unicode; surrogates excluded (not
                # representable in parquet/UTF-8)
                alphabet=st.characters(
                    blacklist_categories=("Cs",), min_codepoint=1
                ),
                min_size=1,
                max_size=20,
            ),
            st.integers(min_value=1, max_value=2**40),
            st.integers(min_value=-(2**40), max_value=2**40),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_envelope_roundtrip_arbitrary_keys(spark, docs):
    """Envelope decode is a true inverse of JSON envelope construction for
    ARBITRARY key strings — quotes, backslashes, braces, unicode — because
    construction goes through to_json (proper escaping) and decode through
    from_json. The connector path cannot be broken by a hostile doc_id."""
    from pyspark.sql import functions as F

    from rap_etl_spark.operators.cdc import parse_debezium_envelope

    df = spark.createDataFrame(docs, ["doc_id", "lsn", "val"])
    env = df.select(
        F.to_json(
            F.struct(
                F.lit("u").alias("op"),
                F.lit(None).cast("struct<doc_id:string,val:bigint>").alias("before"),
                F.struct(F.col("doc_id"), F.col("val")).alias("after"),
                F.struct(
                    F.col("lsn"), F.lit("docs").alias("table")
                ).alias("source"),
                (F.col("lsn") * 1000).alias("ts_ms"),
            )
        ).alias("env")
    )
    parsed = parse_debezium_envelope(env, "env", "doc_id: STRING, val: BIGINT")
    got = {
        r["doc_id"]: (r["lsn"], r["val"], r["op"], r["_corrupt"])
        for r in parsed.collect()
    }
    want = {d: (lsn, val, "U", None) for d, lsn, val in docs}
    assert got == want
