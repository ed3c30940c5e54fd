"""Incremental aggregate maintenance (IVM) over CDC change streams.

The consumer side of `lake.table_changes`: maintain a distributive
aggregate (COUNT / SUM / signed derivations) of a lake table WITHOUT
re-scanning it, by folding the row-level change stream into the aggregate
state. Classic delta-propagation for distributive aggregates: every change
row carries a sign (+1 for insert/update_postimage, -1 for
delete/update_preimage), so

    agg(S')  =  agg(S)  ⊕  agg_signed(ΔS)

holds exactly for counts and sums (use fixed-point/integer columns for
exactness — the operator does not reorder FP additions for you).

Scale design: `agg_delta` is ONE map-side-combinable groupBy over the
(bucket-pruned) change stream, sized to the batch, not the table;
`apply_agg_delta` is one equi-join on the group key between the current
aggregate (|groups| rows) and the delta (|touched groups| rows) — at
10^10-event scale the maintained aggregate never re-reads the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# change types emitted by lake.table_changes
_POS = ("insert", "update_postimage")
_NEG = ("delete", "update_preimage")

def _sign():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.when(F.col("_change_type").isin(*_POS), F.lit(1))
        .when(F.col("_change_type").isin(*_NEG), F.lit(-1))
        .otherwise(F.lit(0))
    )


def agg_delta(
    changes: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Per-group signed deltas from a change stream: `_dn` (row-count
    delta) plus one signed-sum delta per sum_col. One shuffle, sized to
    the batch; HashAggregate with map-side combine."""
    sign = _sign()
    aggs = [F.sum(sign).alias("_dn")] + [
        F.sum(sign * F.col(c)).alias(c) for c in sum_cols
    ]
    return changes.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    current: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Fold a signed delta into the current aggregate state. `current`
    carries group_cols + count_col + sum_cols; groups whose maintained
    count reaches 0 are dropped (the group no longer exists in the base
    table). Full-outer join on the group key admits brand-new groups."""
    cur = current.alias("cur")
    d = delta.alias("d")
    cond = [cur[c].eqNullSafe(d[c]) for c in group_cols]
    n_new = F.coalesce(cur[count_col], F.lit(0)) + F.coalesce(d["_dn"], F.lit(0))
    out_cols = [
        F.coalesce(cur[c], d[c]).alias(c) for c in group_cols
    ] + [n_new.alias(count_col)] + [
        (F.coalesce(cur[c], F.lit(0)) + F.coalesce(d[c], F.lit(0))).alias(c)
        for c in sum_cols
    ]
    return cur.join(d, cond, "full_outer").select(*out_cols).filter(
        F.col(count_col) > 0
    )


def maintain(
    base_agg: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Convenience: base aggregate + one change batch -> next aggregate."""
    return apply_agg_delta(
        base_agg,
        agg_delta(changes, group_cols, sum_cols),
        group_cols,
        sum_cols,
        count_col,
    )


def maintain_join_view(
    view: DataFrame,
    changes: DataFrame,
    dim: DataFrame,
    key: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Incrementally maintain a keyed JOIN view ``V = fact ⋈ dim`` across
    one fact-side change batch, without re-reading the fact table.

    The fact table is keyed (one live row per ``key`` — the lake-table
    invariant), so the view holds at most one row per key ('inner': keys
    with no dim match are absent; 'left': they appear with NULL dim
    columns) and the delta rule collapses to a replace-by-key:

        V' = (V ANTI⋈ keys(Δ))  ∪  (postimages(Δ) ⋈ dim)

    i.e. drop every changed key's old view row, re-derive changed keys'
    rows from their post-images. Inserts (no old row), updates (old row
    dropped + new row added) and deletes (no post-image) all fall out of
    the same two sized-to-the-batch joins: the anti join streams the view
    once against a broadcast of the (tiny) changed-key set, and the dim
    join touches |Δ| rows — the fact table itself is never re-scanned,
    which is the point at 10^10-row fact scale. Dim-side changes are
    handled by re-deriving the affected keys (pass them as ``changes``
    post-images) or by recomputing — classic one-sided IVM.

    ``changes``: `lake.table_changes` output (``_change_type`` column).
    ``on``: join condition Column between post-image columns and ``dim``.
    ``view`` columns define the output; post-image ⋈ dim must be able to
    produce them (same select list as the view definition).
    """
    changed_keys = changes.select(key).distinct()
    post = changes.filter(F.col("_change_type").isin(*_POS))
    fresh = post.join(dim, on, how).select(*view.columns)
    kept = view.join(F.broadcast(changed_keys), on=key, how="left_anti")
    return kept.unionByName(fresh)


def maintain_minmax(
    base_agg: DataFrame,
    changes: DataFrame,
    fact: DataFrame,
    group_cols: list[str],
    val_col: str,
    count_col: str = "n",
) -> DataFrame:
    """Incrementally maintain per-group (count, MIN, MAX) — the
    NON-distributive IVM class. MIN/MAX absorb inserts for free
    (new_min = least(old, batch_min)) but a delete can remove the stored
    extremum, and the second-smallest value is not in the aggregate state.
    The classical answer (maintaining a full value multiset per group) is
    O(table) state; this operator instead re-aggregates from the fact
    table ONLY the groups whose removed-value range touches their stored
    extremum:

        dirty(g)  ⇔  min(removed_g) <= stored_min(g)
                  or  max(removed_g) >= stored_max(g)

    Clean groups update in closed form from the batch alone. Dirty groups
    re-aggregate via a broadcast LEFT SEMI join of the fact scan against
    the (tiny) dirty-group set — one column-pruned pass over the fact
    table touching only matching groups' rows, and ZERO passes when no
    delete hits an extremum (the common case: random deletes hit an
    extremum with probability ~2/|group|). `fact` must be the
    POST-change state (read the table after the merge; at 10^10 rows use
    the bucket-pruned snapshot read).

    `base_agg`: group_cols + [count_col, min_v, max_v] (as produced by
    this function or a bootstrap groupBy). Groups whose maintained count
    reaches 0 drop out; brand-new groups enter from the batch side.
    """
    sign = _sign()
    d = changes.groupBy(*group_cols).agg(
        F.sum(sign).alias("_dn"),
        F.min(F.when(sign == 1, F.col(val_col))).alias("_pos_min"),
        F.max(F.when(sign == 1, F.col(val_col))).alias("_pos_max"),
        F.min(F.when(sign == -1, F.col(val_col))).alias("_neg_min"),
        F.max(F.when(sign == -1, F.col(val_col))).alias("_neg_max"),
    )
    cur = base_agg.alias("cur")
    dd = d.alias("d")
    cond = [cur[c].eqNullSafe(dd[c]) for c in group_cols]
    joined = cur.join(dd, cond, "full_outer")
    n_new = F.coalesce(cur[count_col], F.lit(0)) + F.coalesce(dd["_dn"], F.lit(0))
    dirty = (
        (dd["_neg_min"].isNotNull() & (dd["_neg_min"] <= cur["min_v"]))
        | (dd["_neg_max"].isNotNull() & (dd["_neg_max"] >= cur["max_v"]))
    )
    merged = joined.select(
        *[F.coalesce(cur[c], dd[c]).alias(c) for c in group_cols],
        n_new.alias(count_col),
        F.least(cur["min_v"], dd["_pos_min"]).alias("min_v"),
        F.greatest(cur["max_v"], dd["_pos_max"]).alias("max_v"),
        F.coalesce(dirty, F.lit(False)).alias("_dirty"),
    ).filter(F.col(count_col) > 0)
    clean = merged.filter(~F.col("_dirty")).drop("_dirty")
    dirty_groups = merged.filter(F.col("_dirty")).select(*group_cols)
    # one fact pass, only if some delete touched an extremum; only the
    # dirty groups' rows survive the broadcast semi probe
    reagg = (
        fact.join(F.broadcast(dirty_groups), on=group_cols, how="left_semi")
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias(count_col),
            F.min(val_col).alias("min_v"),
            F.max(val_col).alias("max_v"),
        )
    )
    return clean.unionByName(reagg)


def maintain_topk(
    state: DataFrame,
    changes: DataFrame,
    fact: DataFrame,
    group_cols: list[str],
    val_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Incrementally maintain per-group TOP-K rows (by ``val_col`` desc,
    ties broken by ``key_col`` asc) — the order-statistic IVM class, one
    step harder than MIN/MAX (k=1 degenerates to MAX with a witness row).

    Inserts fold in closed form: a new row enters the stored top-k iff it
    beats the stored k-th value, so ``rank(state ∪ inserted) <= k`` needs
    no fact access. A delete/update-preimage is only a problem when the
    removed row could BE in the stored top-k — the (k+1)-th value is not
    in the state, so those groups re-aggregate from the post-change fact
    table via ONE broadcast LEFT SEMI pass over exactly the dirty groups:

        dirty(g) ⇔ exists removal r in g with val(r) >= stored_kth(g)
                 ∨ |state_g| < k        (state holds the WHOLE group —
                                         any removal changes it)
                 ∨ g not in state       (removal from a never-seen group)

    Random deletes hit a group's top-k with probability ~k/|group|, so at
    10^10-row scale the common batch touches no fact rows at all; the
    dirty path is bucket-prunable when ``fact`` is a lake-table read.

    ``state``: group_cols + [key_col, val_col], at most k rows per group
    (as produced by this function or a bootstrap rank-filter). New groups
    enter from the batch side; groups whose rows all vanish drop out.
    """
    sign = _sign()
    cols = [*group_cols, key_col, val_col]
    ins = changes.filter(sign == 1).select(*cols)
    rem = changes.filter(sign == -1).select(*cols)

    floor = state.groupBy(*group_cols).agg(
        F.min(val_col).alias("_kth"), F.count(F.lit(1)).alias("_sn")
    )
    dirty_groups = (
        rem.join(floor, on=group_cols, how="left")
        .filter(
            F.col("_kth").isNull()  # removal from a group with no state
            | (F.col(val_col) >= F.col("_kth"))
            | (F.col("_sn") < k)
        )
        .select(*group_cols)
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(val_col).desc(), F.col(key_col).asc()
    )
    clean = (
        state.unionByName(ins)
        .join(F.broadcast(dirty_groups), on=group_cols, how="left_anti")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    reagg = (
        fact.select(*cols)
        .join(F.broadcast(dirty_groups), on=group_cols, how="left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return clean.unionByName(reagg)


def maintain_count_distinct(
    ref_state: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    val_col: str,
    ref_col: str = "_refcount",
) -> tuple[DataFrame, DataFrame]:
    """Incrementally maintain per-group exact COUNT(DISTINCT val) — the
    class where deletes defeat sketches (HLL cannot subtract). The classic
    exact answer is a refcount state: one row per live (group, value) pair
    with its multiplicity. Inserts/deletes fold as signed refcount deltas;
    a value's row leaves the state when its refcount reaches 0, and the
    distinct count is simply the state's per-group row count.

    Returns ``(new_ref_state, distinct_counts)``.

    Scale: the fold is ONE map-side-combinable groupBy over the batch
    plus one equi-join against the state on (group, value) — batch-sized
    work against O(live distinct pairs) state, never a fact re-scan. The
    state is a plain keyed DataFrame: at 10^10-row scale it lives as its
    own bucketed lake table keyed by (group, value) and this fold becomes
    a normal signed merge into it (the same machinery as every other
    maintained view in this module).
    """
    sign = _sign()
    keys = [*group_cols, val_col]
    d = changes.groupBy(*keys).agg(F.sum(sign).alias("_d"))
    st = ref_state.alias("st")
    dd = d.alias("d")
    cond = [st[c].eqNullSafe(dd[c]) for c in keys]
    new_state = (
        st.join(dd, cond, "full_outer")
        .select(
            *[F.coalesce(st[c], dd[c]).alias(c) for c in keys],
            (
                F.coalesce(st[ref_col], F.lit(0))
                + F.coalesce(dd["_d"], F.lit(0))
            ).alias(ref_col),
        )
        .filter(F.col(ref_col) > 0)
    )
    counts = new_state.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    return new_state, counts


def maintain_token_stats(
    stats: DataFrame,
    changes: DataFrame,
    tokens_col: str = "tokens",
    token_col: str = "token",
    count_col: str = "freq",
) -> DataFrame:
    """Incrementally maintain the corpus-wide token-frequency table of a
    CDC'd tokenized-sequence corpus — the tokens-payload special case
    that makes vocabulary stats, drift monitors, and BPE refresh feasible
    at 10^10 rows: the corpus is NEVER re-exploded; only the change
    stream's token arrays are.

    Token frequency is a distributive sum, so the signed fold is exact:
    an update contributes preimage tokens at -1 and postimage tokens at
    +1, and an unchanged token inside a changed document cancels in the
    same map-side combine. Tokens whose maintained frequency reaches 0
    drop out; brand-new tokens enter from the batch side.

    Scale: explode(batch) is batch-sized (the corpus explode happens once
    at bootstrap); the fold is one groupBy(token) with map-side combine
    (~|vocab| result rows) plus one equi-join against the O(vocab) stats
    frame. Vocabulary is Zipf-bounded — the stats frame broadcasts.
    """
    sign = _sign()
    d = (
        changes.select(F.explode(tokens_col).alias(token_col), sign.alias("_s"))
        .groupBy(token_col)
        .agg(F.sum("_s").alias("_d"))
    )
    st = stats.alias("st")
    dd = d.alias("d")
    return (
        st.join(dd, st[token_col].eqNullSafe(dd[token_col]), "full_outer")
        .select(
            F.coalesce(st[token_col], dd[token_col]).alias(token_col),
            (
                F.coalesce(st[count_col], F.lit(0))
                + F.coalesce(dd["_d"], F.lit(0))
            ).alias(count_col),
        )
        .filter(F.col(count_col) > 0)
    )


def maintain_distinct_sketch(
    base_agg: DataFrame,
    changes: DataFrame,
    fact: DataFrame,
    group_cols: list[str],
    val_col: str,
    count_col: str = "n",
    lgk: int = 12,
) -> DataFrame:
    """Incrementally maintain a per-group HLL DISTINCT sketch (X102) —
    the bounded-state alternative to exact COUNT(DISTINCT) maintenance
    (``maintain_count_distinct``'s refcount state is O(distinct values);
    this state is O(groups × 2^lgk bytes) no matter how wide the value
    domain gets — the 100-TB answer when per-group domains are huge).

    State per group: ``count_col`` (row count, for group-death detection),
    ``sk`` (DataSketches HLL binary, Spark's native hll_sketch_agg), and
    ``est`` (its cardinality estimate, refreshed on every maintenance).

    Maintenance splits by the sketch's algebra:

    - Inserts are FREE: HLL is a mergeable insert-only summary, so a
      clean group folds the batch's sketch in with one scalar
      ``hll_union`` — no fact access, delta-sized work only.
    - Deletes (and update PREimages: the old value may have been the
      last carrier of its hash) cannot be subtracted from an HLL, so any
      group with a negative contribution goes DIRTY and re-aggregates
      from the fact via the same broadcast-LEFT-SEMI pattern as
      ``maintain_minmax`` — one column-pruned pass touching only dirty
      groups' rows, zero passes for append-only batches (the training-
      corpus common case).

    `fact` must be the POST-change table state. Groups whose maintained
    row count reaches 0 drop out; brand-new groups enter from the batch.
    """
    sign = _sign()
    d = changes.groupBy(*group_cols).agg(
        F.sum(sign).alias("_dn"),
        F.hll_sketch_agg(
            F.when(sign == 1, F.col(val_col)), F.lit(lgk)
        ).alias("_pos_sk"),
        F.max(F.when(sign == -1, F.lit(1)).otherwise(F.lit(0))).alias(
            "_has_neg"
        ),
    )
    cur = base_agg.alias("cur")
    dd = d.alias("d")
    cond = [cur[c].eqNullSafe(dd[c]) for c in group_cols]
    joined = cur.join(dd, cond, "full_outer")
    n_new = F.coalesce(cur[count_col], F.lit(0)) + F.coalesce(
        dd["_dn"], F.lit(0)
    )
    sk_new = (
        F.when(
            cur["sk"].isNotNull() & dd["_pos_sk"].isNotNull(),
            F.hll_union(cur["sk"], dd["_pos_sk"]),
        )
        .when(cur["sk"].isNotNull(), cur["sk"])
        .otherwise(dd["_pos_sk"])
    )
    merged = joined.select(
        *[F.coalesce(cur[c], dd[c]).alias(c) for c in group_cols],
        n_new.alias(count_col),
        sk_new.alias("sk"),
        (F.coalesce(dd["_has_neg"], F.lit(0)) == 1).alias("_dirty"),
    ).filter(F.col(count_col) > 0)
    clean = (
        merged.filter(~F.col("_dirty"))
        .drop("_dirty")
        .withColumn("est", F.hll_sketch_estimate("sk"))
    )
    dirty_groups = merged.filter(F.col("_dirty")).select(*group_cols)
    reagg = (
        fact.join(F.broadcast(dirty_groups), on=group_cols, how="left_semi")
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias(count_col),
            F.hll_sketch_agg(val_col, F.lit(lgk)).alias("sk"),
        )
        .withColumn("est", F.hll_sketch_estimate("sk"))
    )
    return clean.unionByName(reagg)
