"""Relational operator surface (SURVEY.md §2.2) — the driver-contract
queries() inventory with DuckDB oracle SQL.

Each entry is a named, tested wrapper demonstrating an engine operator on
the driver's star schema; several are load-bearing inside the CDC pipeline
(LWW, diff, salted aggregation, as-of). Conventions:

- every computed column is aliased IDENTICALLY in the Spark plan and the
  oracle SQL (the driver's compare sorts columns by name and value-hashes);
- double aggregates are rounded (2-4 dp) in BOTH engines — cross-engine
  float summation differs in the last ulp, rounding makes the hash stable;
- timestamps are formatted to strings in BOTH engines;
- top-k orderings always carry a unique tiebreak column so the selected
  row SET is deterministic.

ORACLES maps a subset of QUERIES keys to DuckDB SQL; keys absent from
ORACLES are non-SQL-expressible (approx sketches, pandas UDF internals,
partition-dependent ops) and get the driver's rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rap_etl_spark.functions.tokens import (
    clipped_token_sum_py,
    token_count_py,
)
from rap_etl_spark.operators.asof import asof_join
from rap_etl_spark.operators.cdc import lww_latest


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/{name}.parquet")


# --------------------------------------------------------------------------
# scans / projection / filter / json
# --------------------------------------------------------------------------
def q_scan_lineitem(spark, sf):
    return _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


def q_project_lineitem(spark, sf):
    li = _t(spark, sf, "lineitem")
    # round to 4dp: price/discount carry <=4 true decimals, so the product
    # is never at a rounding midpoint — any tie mode agrees cross-engine
    # (2dp WOULD hit midpoints: Spark HALF_UP vs DuckDB half-even diverge)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


def q_filter_pred(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24)
        & F.col("l_shipdate").between("1994-01-01", "1995-12-31")
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
    ).select("l_orderkey", "l_linenumber")


def q_json_extract(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_str")
    )


def q_fn_json(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


def _orders_variant(spark, sf):
    """A nested semi-structured payload as Spark 4's VARIANT type (the
    Parquet/Iceberg-v3 variant column shape): the JSON text is built by
    plain string concat from ints/strings only, so the DuckDB oracle can
    construct the byte-identical document — no float-formatting hazard —
    and `parse_json` shreds it to the binary variant encoding once."""
    o = _t(spark, sf, "orders")
    js = F.concat(
        F.lit('{"id":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"cust":{"key":'),
        F.col("o_custkey").cast("string"),
        F.lit(',"prio":"'),
        F.col("o_orderpriority"),
        F.lit('"},"tags":['),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit(","),
        (F.col("o_custkey") % 5).cast("string"),
        F.lit("]}"),
    )
    return o.select("o_orderkey", F.parse_json(js).alias("v"))


def q_fn_variant(spark, sf):
    """VARIANT path extraction (F9): typed `variant_get` at nested object
    and array-index paths, plus `try_variant_get` on a missing path (NULL,
    not error). Unlike get_json_object, the variant is parsed ONCE and
    every extraction is a cheap binary-encoding probe — the right shape
    when one payload feeds many projections at scale."""
    ov = _orders_variant(spark, sf)
    return ov.select(
        F.col("o_orderkey").alias("k"),
        F.variant_get("v", "$.cust.key", "bigint").alias("cust_key"),
        F.variant_get("v", "$.cust.prio", "string").alias("prio"),
        F.variant_get("v", "$.tags[1]", "int").alias("tag1"),
        F.try_variant_get("v", "$.missing", "int").alias("absent"),
    )


def q_variant_shred(spark, sf):
    """Shred-then-aggregate: extract typed columns out of the variant and
    run a relational aggregate over them — the lazy-shredding pattern that
    lets a 100-TB table keep one variant column yet pay columnar costs
    only for the paths a query touches."""
    ov = _orders_variant(spark, sf)
    return (
        ov.select(
            F.variant_get("v", "$.cust.prio", "string").alias("prio"),
            F.variant_get("v", "$.tags[0]", "long").alias("tag0"),
        )
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("tag0").alias("sum_tag0"),
        )
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------
def q_join_broadcast(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_join_sortmerge(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_join_semi(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select("o_orderkey")


def q_join_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def q_join_full(spark, sf):
    c = _t(spark, sf, "customer").select("c_custkey")
    agg = (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = c.join(agg, c.c_custkey == agg.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


def q_join_range(spark, sf):
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    j = p.join(
        li,
        (p.p_partkey == li.l_partkey)
        & (li.l_quantity >= p.p_size - 5)
        & (li.l_quantity <= p.p_size + 5),
    )
    return j.groupBy("p_brand").agg(F.count(F.lit(1)).alias("cnt"))


def q_join_asof(spark, sf):
    """For each open ('O') order: the customer's most recent finished ('F')
    order at-or-before its date. Right side pre-reduced to one row per
    (custkey, date) so the as-of match is deterministic."""
    o = _t(spark, sf, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    right = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("prev_orderkey"))
        .select("o_custkey", F.col("o_orderdate").alias("f_date"), "prev_orderkey")
    )
    out = asof_join(
        left, right, key="o_custkey", left_ts="o_orderdate", right_ts="f_date",
        right_payload=["prev_orderkey"],
    )
    return out.select("o_orderkey", "prev_orderkey")


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------
def q_agg_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("cnt"),
    )


def q_agg_count_distinct(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )


def q_agg_approx_distinct(spark, sf):
    """A6 approximate distinct — via the mergeable DataSketches HLL
    (lgConfigK=21) rather than approx_count_distinct: same operator
    class and cost model (fixed-size mergeable state, map-side partial),
    but the coupon (exact) mode then covers every testdata SF, so this
    key is value-oracled against exact COUNT(DISTINCT) — the same
    exact-regime strategy as operators/sketches.py. (Spark's HLL++
    approx_count_distinct leaves its sparse-exact regime by sf0.1's
    1.5k users/group even at rsd=0.001; the exact twin
    `agg_count_distinct` stays the comparison point for exact cost.)"""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 21)).alias(
            "approx_users"
        )
    )


def q_agg_rollup(spark, sf):
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("cnt"))


def q_agg_collect(spark, sf):
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources")
    )


def q_agg_pandas_udaf(spark, sf):
    """Grouped-agg pandas UDAF: p95 of n_chars per lang. Oracled by value:
    pandas' quantile and DuckDB's quantile_cont both interpolate linearly,
    and rounding to 4dp in both engines removes ulp-level divergence."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def p95_fn(v):
        return round(float(v.quantile(0.95)), 4)

    # real (non-stringified) annotations so pyspark recognizes GROUPED_AGG
    # despite `from __future__ import annotations` in this module
    p95_fn.__annotations__ = {"v": pd.Series, "return": float}
    p95 = pandas_udf(p95_fn, "double")

    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(p95("n_chars").alias("p95_chars"))


# --------------------------------------------------------------------------
# windows
# --------------------------------------------------------------------------
def q_win_rank(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "user_id", "event_id", F.row_number().over(w).alias("rn")
    )


def q_win_lag(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


def q_win_running_sum(spark, sf):
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 2).alias("run_sum")
    )


def _epoch_us(df: DataFrame, ts_col: str):
    """Epoch microseconds of a timestamp column, NTZ-safe: a naive
    (TIMESTAMP_NTZ) value is treated as UTC — the same convention DuckDB's
    epoch_us uses — via timestampdiff from the NTZ epoch literal, so no
    session-timezone reinterpretation sneaks in."""
    dt = dict(df.dtypes)[ts_col]
    if dt == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tiebreak_col: str,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): rows of one key belong to
    the same session while consecutive timestamps are within `gap_us`
    microseconds; a larger gap opens a new session. Two window passes
    over the SAME (key, ts) ordering — one lag, one running sum — so
    there is exactly one shuffle (partitionBy key) and both windows
    pipeline in a single sort. This is the batch twin of the streaming
    session window (streaming/tail.py R4): same semantics, replayable
    over history instead of a watermark."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    us = _epoch_us(df, ts_col)
    new_session = (
        F.coalesce(
            (us - F.lag(us).over(w)) > F.lit(int(gap_us)), F.lit(True)
        )
    ).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )


def q_win_sessionize(spark, sf):
    """Gaps-and-islands sessionization over the events stream: 30-minute
    inactivity gap per user; output = per-session bounds + volume. The
    oracle is the identical lag/cumsum statement in SQL — epoch
    microseconds on both sides keep timestamp arithmetic dialect-free."""
    ev = _t(spark, sf, "events")
    s = sessionize(
        ev, "user_id", "ts", gap_us=1_800_000_000, tiebreak_col="event_id"
    )
    us = _epoch_us(s, "ts")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def q_win_ntile(spark, sf):
    """ntile(4) over a total order WITHOUT the single-partition global
    window `F.ntile` lowers to. SQL-standard ntile is a closed-form
    function of (row_number, N): with q = N div 4, rem = N mod 4, the
    first rem tiles take q+1 rows and the rest take q. row_number comes
    from the X45 two-phase distributed prefix sum (weight ≡ 1, see
    operators/sharding.global_rank) and N falls out of the same
    per-partition counts — so the plan is range-exchange + narrow scan,
    never a sort of all orders on one task. Integer `div` arithmetic
    keeps tile boundaries exact at any N (no double rounding)."""
    from rap_etl_spark.operators.sharding import global_rank

    o = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    ranked, n_rows = global_rank(
        o, ["o_totalprice", "o_orderkey"], rank_col="_rnk"
    )
    q, rem = divmod(n_rows, 4)
    cut = rem * (q + 1)
    tile = F.expr(
        f"cast(case when _rnk <= {cut}"
        f" then (_rnk - 1) div {q + 1} + 1"
        f" else {rem} + (_rnk - 1 - {cut}) div {max(q, 1)} + 1"
        " end as int)"
    )
    return ranked.select("o_orderkey", tile.alias("tile"))


def q_agg_histogram(spark, sf):
    """Equi-width histogram of order totals (20 buckets over [0, 500000))
    — the profiling/EDA staple, one groupBy on a computed bucket id."""
    o = _t(spark, sf, "orders")
    b = F.floor(F.col("o_totalprice") / 25000).cast("long")
    return (
        o.groupBy(F.least(b, F.lit(19)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# sort / top-k / set ops
# --------------------------------------------------------------------------
def q_sort_orders(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
    )


def q_topk_orders(spark, sf):
    return q_sort_orders(spark, sf).limit(10)


def q_topk_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


def q_set_union(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s)


def q_set_intersect(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


def q_set_except(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.distinct().subtract(s.distinct())


def q_set_distinct(spark, sf):
    return _t(spark, sf, "orders").select("o_orderpriority", "o_orderstatus").distinct()




# --------------------------------------------------------------------------
# scalar functions
# --------------------------------------------------------------------------
def q_fn_string(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.substring("text", 1, 12).alias("prefix"),
        F.size(F.split("text", " ")).alias("n_words"),
        F.concat_ws("-", "lang", "source").alias("tag"),
    )


def q_fn_hash(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.md5(F.concat("text", "lang")).alias("h"))


def q_fn_date(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
    )


def q_fn_math(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.round("value", 1).alias("r1"),
        F.ceil("value").alias("c"),
        F.floor("value").alias("fl"),
        F.pmod("event_id", F.lit(7)).alias("m7"),
    )


def q_fn_case(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") > 150, "high")
        .when(F.col("value") > 75, "mid")
        .otherwise("low")
        .alias("band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("none")).alias("et"),
        F.greatest("value", F.lit(100.0)).alias("g"),
        F.least("value", F.lit(100.0)).alias("l"),
    )


def q_fn_array(spark, sf):
    # first_val_e4 = floor(x * 1e4) instead of round(x, 4): round's
    # half-way behavior differs between engines (Spark HALF_UP vs
    # DuckDB), and at sf0.1 some float32 embedding values land exactly
    # on the boundary — floor is rounding-mode-free on both sides
    e = _t(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.floor(F.element_at("embedding", 1).cast("double") * 10000)
        .cast("long")
        .alias("first_val_e4"),
    )


def q_stream_tumbling(spark, sf):
    """Tumbling-window agg (R2) in batch mode — same plan shape Structured
    Streaming uses per micro-batch; oracled via epoch-aligned time_bucket."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "cnt",
            "sum_val",
        )
    )


# --------------------------------------------------------------------------
# CDC operators on the star schema (the engine's primitives, oracled)
# --------------------------------------------------------------------------
def q_cdc_dedup(spark, sf):
    """C1 dedup: double-deliver a fifth of the events, dedup by event_id —
    recovering exactly the original table."""
    ev = _t(spark, sf, "events")
    dup = ev.filter(F.col("event_id") % 20 == 0)
    return ev.unionByName(dup).dropDuplicates(["event_id"])


def q_cdc_lww(spark, sf):
    """C2 LWW on orders: latest order (max orderkey = LSN) per customer."""
    o = _t(spark, sf, "orders").select(
        "o_custkey", F.col("o_orderkey").alias("lsn"), "o_totalprice"
    )
    return lww_latest(o, key="o_custkey")


def q_cdc_diff(spark, sf):
    """C3 diff: latest-state-per-customer now vs before 1996-01-01 —
    classify I (new key), U (changed), N (unchanged)."""
    o = _t(spark, sf, "orders")
    new = lww_latest(
        o.select("o_custkey", F.col("o_orderkey").alias("lsn"), "o_totalprice"),
        key="o_custkey",
    ).alias("n")
    old = lww_latest(
        o.filter(F.col("o_orderdate") < "1996-01-01").select(
            "o_custkey", F.col("o_orderkey").alias("lsn"), "o_totalprice"
        ),
        key="o_custkey",
    ).alias("o")
    j = new.join(old, on=F.col("n.o_custkey") == F.col("o.o_custkey"), how="left")
    action = (
        F.when(F.col("o.o_custkey").isNull(), "I")
        .when(
            (F.col("n.lsn") != F.col("o.lsn"))
            | (F.col("n.o_totalprice") != F.col("o.o_totalprice")),
            "U",
        )
        .otherwise("N")
    )
    return j.select(F.col("n.o_custkey").alias("o_custkey"), action.alias("action"))


def q_skew_salt_count(spark, sf):
    """C5 two-phase salted aggregation: per-supplier counts with the hot-key
    shuffle spread over 8 salt buckets, then a tiny final reduce."""
    li = _t(spark, sf, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(8)))
    p1 = salted.groupBy("l_suppkey", "_salt").agg(F.count(F.lit(1)).alias("c"))
    return p1.groupBy("l_suppkey").agg(F.sum("c").alias("cnt"))


def q_lineage_agg(spark, sf):
    """C9 lineage shape: offset-range + row-count per source slice (slice =
    event_id div 100 as a deterministic stand-in for partition id)."""
    ev = _t(spark, sf, "events")
    return (
        ev.withColumn("slice_id", (F.col("event_id") / 100).cast("long"))
        .groupBy("slice_id")
        .agg(
            F.min("event_id").alias("lsn_min"),
            F.max("event_id").alias("lsn_max"),
            F.count(F.lit(1)).alias("rows_applied"),
        )
    )


# --------------------------------------------------------------------------
# vectorized token kernels (pandas UDFs with SQL oracles)
# --------------------------------------------------------------------------
def _doc_tokens(spark, sf):
    """documents + a derived array<int> token column (word lengths — cheap,
    deterministic, SQL-mirrorable)."""
    d = _t(spark, sf, "documents")
    return d.withColumn(
        "tokens", F.transform(F.split("text", " "), lambda w: F.length(w))
    )


def q_token_recount(spark, sf):
    """C11: n_tok recount through the Arrow-batched pandas kernel."""
    return _doc_tokens(spark, sf).select(
        "doc_id", token_count_py(F.col("tokens")).alias("n_tok")
    )


def q_token_clip(spark, sf):
    """C11: sum of the first 8 tokens via a vectorized numpy reduceat kernel."""
    return _doc_tokens(spark, sf).select(
        "doc_id", clipped_token_sum_py(8)(F.col("tokens")).alias("clip_sum")
    )


def q_udf_iter_tokens(spark, sf):
    """V2 iterator pandas UDF (Iterator[pd.Series] -> Iterator[pd.Series]):
    remapped token sum with the remap table built once per worker and
    amortized across Arrow batches (functions/tokens.remap_token_sum_iter).
    Oracled by value — the remap is plain modular arithmetic in SQL."""
    from rap_etl_spark.functions.tokens import remap_token_sum_iter

    return _doc_tokens(spark, sf).select(
        "doc_id", remap_token_sum_iter(7, 3, 64)(F.col("tokens")).alias("remap_sum")
    )


def q_udf_grouped_map(spark, sf):
    """V3 grouped-map applyInPandas: per-source document count + total chars
    computed inside the pandas group kernel. Oracled by value (exact
    integer aggregates reproduce in plain SQL)."""
    import pandas as pd

    d = _t(spark, sf, "documents")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(pdf["n_chars"].sum())],
            }
        )

    return d.groupBy("source").applyInPandas(
        stats, schema="source string, n_docs long, total_chars long"
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
QUERIES = {
    "scan_lineitem": q_scan_lineitem,
    "project_lineitem": q_project_lineitem,
    "filter_pred": q_filter_pred,
    "json_extract": q_json_extract,
    "fn_json": q_fn_json,
    "fn_variant": q_fn_variant,
    "variant_shred": q_variant_shred,
    "join_broadcast": q_join_broadcast,
    "join_sortmerge": q_join_sortmerge,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_full": q_join_full,
    "join_range": q_join_range,
    "join_asof": q_join_asof,
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_count_distinct": q_agg_count_distinct,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_rollup": q_agg_rollup,
    "agg_collect": q_agg_collect,
    "agg_pandas_udaf": q_agg_pandas_udaf,
    "win_rank": q_win_rank,
    "win_lag": q_win_lag,
    "win_running_sum": q_win_running_sum,
    "win_ntile": q_win_ntile,
    "win_sessionize": q_win_sessionize,
    "agg_histogram": q_agg_histogram,
    "sort_orders": q_sort_orders,
    "topk_orders": q_topk_orders,
    "topk_per_group": q_topk_per_group,
    "set_union": q_set_union,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "set_distinct": q_set_distinct,
    "fn_string": q_fn_string,
    "fn_hash": q_fn_hash,
    "fn_date": q_fn_date,
    "fn_math": q_fn_math,
    "fn_case": q_fn_case,
    "fn_array": q_fn_array,
    "stream_tumbling": q_stream_tumbling,
    "cdc_dedup": q_cdc_dedup,
    "cdc_lww": q_cdc_lww,
    "cdc_diff": q_cdc_diff,
    "skew_salt_count": q_skew_salt_count,
    "lineage_agg": q_lineage_agg,
    "token_recount": q_token_recount,
    "token_clip": q_token_clip,
    "udf_iter_tokens": q_udf_iter_tokens,
    "udf_grouped_map": q_udf_grouped_map,
}

ORACLES = {
    "scan_lineitem": "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "project_lineitem": (
        "SELECT l_orderkey, l_linenumber,"
        " round(l_extendedprice * (1 - l_discount), 4) AS revenue FROM lineitem"
    ),
    "filter_pred": (
        "SELECT l_orderkey, l_linenumber FROM lineitem"
        " WHERE l_quantity < 24"
        " AND l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1995-12-31'"
        " AND l_returnflag IN ('A','R') AND l_linestatus LIKE 'F%'"
    ),
    "json_extract": (
        "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events"
    ),
    "fn_json": (
        "SELECT event_id,"
        " CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val FROM events"
    ),
    "fn_variant": (
        "WITH j AS (SELECT o_orderkey,"
        " '{\"id\":' || o_orderkey || ',\"cust\":{\"key\":' || o_custkey"
        " || ',\"prio\":\"' || o_orderpriority || '\"},\"tags\":['"
        " || (o_orderkey % 7) || ',' || (o_custkey % 5) || ']}' AS js"
        " FROM orders)"
        " SELECT o_orderkey AS k,"
        " CAST(json_extract_string(js, '$.cust.key') AS BIGINT) AS cust_key,"
        " json_extract_string(js, '$.cust.prio') AS prio,"
        " CAST(json_extract_string(js, '$.tags[1]') AS INTEGER) AS tag1,"
        " CAST(NULL AS INTEGER) AS absent FROM j"
    ),
    "variant_shred": (
        "WITH j AS (SELECT o_orderpriority AS prio, (o_orderkey % 7) AS tag0"
        " FROM orders)"
        " SELECT prio, count(*) AS cnt, CAST(sum(tag0) AS BIGINT) AS sum_tag0"
        " FROM j GROUP BY prio"
    ),
    "join_broadcast": (
        "SELECT n_name, count(*) AS cnt FROM customer"
        " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "join_sortmerge": (
        "SELECT o_orderkey, count(*) AS n_items, round(sum(l_quantity),2) AS sum_qty"
        " FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderkey"
    ),
    "join_semi": (
        "SELECT o_orderkey FROM orders WHERE o_orderkey IN"
        " (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)"
    ),
    "join_anti": (
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN"
        " (SELECT o_custkey FROM orders)"
    ),
    "join_full": (
        "WITH agg AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)"
        " SELECT coalesce(c_custkey, o_custkey) AS custkey,"
        " coalesce(n_orders, 0) AS n_orders"
        " FROM customer FULL OUTER JOIN agg ON c_custkey = o_custkey"
    ),
    "join_range": (
        "SELECT p_brand, count(*) AS cnt FROM part JOIN lineitem"
        " ON p_partkey = l_partkey AND l_quantity BETWEEN p_size - 5 AND p_size + 5"
        " GROUP BY p_brand"
    ),
    "join_asof": (
        "WITH l AS (SELECT o_custkey, o_orderkey, o_orderdate FROM orders"
        "           WHERE o_orderstatus = 'O'),"
        " r AS (SELECT o_custkey, o_orderdate AS f_date,"
        "       max(o_orderkey) AS prev_orderkey FROM orders"
        "       WHERE o_orderstatus = 'F' GROUP BY 1, 2)"
        " SELECT l.o_orderkey, r.prev_orderkey"
        " FROM l ASOF LEFT JOIN r"
        " ON l.o_custkey = r.o_custkey AND l.o_orderdate >= r.f_date"
    ),
    "agg_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,"
        " round(sum(l_extendedprice),2) AS sum_base, round(avg(l_discount),4) AS avg_disc,"
        " count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "agg_count_distinct": (
        "SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust"
        " FROM orders GROUP BY o_orderpriority"
    ),
    "agg_pandas_udaf": (
        "SELECT lang, round(quantile_cont(n_chars, 0.95), 4) AS p95_chars"
        " FROM documents GROUP BY lang"
    ),
    "udf_grouped_map": (
        "SELECT source, count(*) AS n_docs,"
        " CAST(sum(n_chars) AS BIGINT) AS total_chars"
        " FROM documents GROUP BY source"
    ),
    "agg_rollup": (
        "SELECT r_name, n_name, count(*) AS cnt FROM customer"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY ROLLUP (r_name, n_name)"
    ),
    "agg_collect": (
        "SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources"
        " FROM documents GROUP BY lang"
    ),
    "win_rank": (
        "SELECT user_id, event_id, row_number() OVER"
        " (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn FROM events"
    ),
    "win_lag": (
        "SELECT user_id, event_id,"
        " lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,"
        " lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value"
        " FROM events"
    ),
    "win_running_sum": (
        "SELECT user_id, event_id, round(sum(value) OVER"
        " (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum FROM events"
    ),
    "win_ntile": (
        "SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile"
        " FROM orders"
    ),
    "win_sessionize": (
        "WITH e AS (SELECT user_id, ts, event_id, value,"
        "   epoch_us(ts) AS us FROM events),"
        " g AS (SELECT *, CASE WHEN"
        "   us - lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "   > 1800000000"
        "   OR lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "   IS NULL THEN 1 ELSE 0 END AS ns FROM e),"
        " s AS (SELECT *, CAST(sum(ns) OVER"
        "   (PARTITION BY user_id ORDER BY ts, event_id"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)"
        "   AS session_id FROM g)"
        " SELECT user_id, session_id, count(*) AS n_events,"
        "  min(us) AS start_us, max(us) AS end_us,"
        "  round(sum(value), 4) AS total_value"
        " FROM s GROUP BY user_id, session_id"
    ),
    "agg_histogram": (
        "SELECT least(CAST(floor(o_totalprice / 25000) AS BIGINT), 19) AS bucket,"
        " count(*) AS n FROM orders GROUP BY 1"
    ),
    "sort_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey ASC"
    ),
    "topk_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
    ),
    "topk_per_group": (
        "SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM ("
        " SELECT o_orderpriority, o_orderkey, o_totalprice, row_number() OVER"
        " (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn"
        " FROM orders) WHERE rn <= 5"
    ),
    "set_union": (
        "SELECT c_nationkey AS nk FROM customer"
        " UNION ALL SELECT s_nationkey AS nk FROM supplier"
    ),
    "set_intersect": (
        "SELECT c_nationkey AS nk FROM customer"
        " INTERSECT SELECT s_nationkey AS nk FROM supplier"
    ),
    "set_except": (
        "SELECT c_nationkey AS nk FROM customer"
        " EXCEPT SELECT s_nationkey AS nk FROM supplier"
    ),
    "set_distinct": "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
    "fn_string": (
        "SELECT doc_id, upper(lang) AS lang_up, substr(text, 1, 12) AS prefix,"
        " len(string_split(text, ' ')) AS n_words,"
        " concat_ws('-', lang, source) AS tag FROM documents"
    ),
    "fn_hash": "SELECT doc_id, md5(text || lang) AS h FROM documents",
    "fn_date": (
        "SELECT event_id, strftime(ts, '%Y-%m-%d') AS day,"
        " CAST(year(ts) AS INTEGER) AS yr, CAST(month(ts) AS INTEGER) AS mo,"
        " CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)"
        " AS days_since FROM events"
    ),
    "fn_math": (
        "SELECT event_id, round(value, 1) AS r1, CAST(ceil(value) AS BIGINT) AS c,"
        " CAST(floor(value) AS BIGINT) AS fl, event_id % 7 AS m7 FROM events"
    ),
    "fn_case": (
        "SELECT event_id,"
        " CASE WHEN value > 150 THEN 'high' WHEN value > 75 THEN 'mid'"
        " ELSE 'low' END AS band,"
        " coalesce(nullif(event_type, 'error'), 'none') AS et,"
        " greatest(value, 100.0) AS g, least(value, 100.0) AS l FROM events"
    ),
    "fn_array": (
        "SELECT vec_id, len(embedding) AS n_dims,"
        " CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT)"
        " AS first_val_e4 FROM embeddings"
    ),
    "stream_tumbling": (
        "SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S')"
        " AS win_start, event_type, count(*) AS cnt, round(sum(value),2) AS sum_val"
        " FROM events GROUP BY 1, 2"
    ),
    "cdc_dedup": (
        "SELECT event_id, ts, user_id, event_type, value, props FROM events"
    ),
    "cdc_lww": (
        "SELECT o_custkey, max(o_orderkey) AS lsn,"
        " arg_max(o_totalprice, o_orderkey) AS o_totalprice"
        " FROM orders GROUP BY o_custkey"
    ),
    "cdc_diff": (
        "WITH newest AS (SELECT o_custkey, max(o_orderkey) AS lsn,"
        "   arg_max(o_totalprice, o_orderkey) AS tp FROM orders GROUP BY 1),"
        " old AS (SELECT o_custkey, max(o_orderkey) AS lsn,"
        "   arg_max(o_totalprice, o_orderkey) AS tp FROM orders"
        "   WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1)"
        " SELECT n.o_custkey, CASE WHEN o.o_custkey IS NULL THEN 'I'"
        "   WHEN n.lsn <> o.lsn OR n.tp <> o.tp THEN 'U' ELSE 'N' END AS action"
        " FROM newest n LEFT JOIN old o ON n.o_custkey = o.o_custkey"
    ),
    "skew_salt_count": (
        "SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey"
    ),
    "lineage_agg": (
        "SELECT event_id // 100 AS slice_id, min(event_id) AS lsn_min,"
        " max(event_id) AS lsn_max, count(*) AS rows_applied"
        " FROM events GROUP BY 1"
    ),
    "token_recount": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok"
        " FROM documents"
    ),
    "token_clip": (
        "SELECT doc_id, CAST(list_sum(list_transform(string_split(text, ' ')[1:8],"
        " w -> length(w))) AS BIGINT) AS clip_sum FROM documents"
    ),
    "udf_iter_tokens": (
        "SELECT doc_id, CAST(list_sum(list_transform(string_split(text, ' '),"
        " w -> (7 * length(w) + 3) % 64)) AS BIGINT) AS remap_sum FROM documents"
    ),
    "agg_approx_distinct": (
        "SELECT event_type, count(DISTINCT user_id) AS approx_users"
        " FROM events GROUP BY event_type"
    ),
}
