"""Connected components over near-duplicate pairs (training-data dedup).

Near-dup detection (neardup.py: MinHash/SimHash/Jaccard) emits PAIRS; a
training-data pipeline needs CLUSTERS — transitively closed groups — so
one representative per cluster can be kept. Transitive closure is the
gap between the two, and at 10^10 documents it cannot be a driver-side
union-find: the edge set alone may be billions of rows.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature). Each round is two shuffles of the EDGE set (a groupBy-min
and a join); no per-node adjacency lists are ever materialized (no
collect_list, so a 10^6-degree hub costs the same shuffle bytes as a
leaf), and convergence is O(log^2 n) rounds on ANY graph shape — not
O(diameter) like naive label propagation, which needs 500 rounds for a
500-link chain. Dedup graphs are usually shallow (diameter 3-4), but
"usually" is not an engine guarantee; chains DO arise (doc A ~ B ~ C
... under a sliding similarity threshold), and the star algorithm makes
the worst case cheap instead of hoping it never happens.

Scale notes:
- state between rounds is exactly one (u, v) long-pair DataFrame,
  canonical orientation u < v; each round shuffles O(|E|) longs;
- the loop is a driver-side WHILE over Spark jobs with eager
  localCheckpoint() per round to truncate lineage (round k's plan would
  otherwise nest 2k joins and overwhelm the optimizer long before the
  data hurts);
- the convergence probe is two limit(1)-counted exceptAll diffs — no
  driver materialization beyond a 0/1 count;
- a skewed super-node (one doc near-duping everything) is an
  input-quality signal; `max_degree` optionally drops super-nodes first
  (standard dedup hygiene) and AQE handles residual shuffle skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star round over a canonical
    (u < v, deduped) edge set.

    Both rounds compute, per node, the minimum of its closed neighborhood
    m(n) = min({n} U neighbors(n)), then re-point a subset of neighbors
    at m(n):

    - large-star re-points each node's STRICTLY LARGER neighbors at m(n)
      (trees get shallower; every original edge (u,v) is covered by the
      smaller endpoint's star, and the kept (n, m(n)) edge preserves
      connectivity through the minimum);
    - small-star re-points each node's SMALLER neighbors (and the node
      itself) at m(n) (stars contract onto the minimum).
    """
    sym = edges.select(
        F.col("u").alias("n"), F.col("v").alias("nb")
    ).unionAll(edges.select(F.col("v").alias("n"), F.col("u").alias("nb")))
    # m(n) = min over the closed neighborhood — map-side combinable
    m = sym.groupBy("n").agg(
        F.min(F.least(F.col("n"), F.col("nb"))).alias("m")
    )
    flt = F.col("nb") > F.col("n") if large else F.col("nb") < F.col("n")
    repoint = (
        sym.filter(flt)
        .join(m, "n")
        .select(F.col("nb").alias("a"), F.col("m").alias("b"))
    )
    keep = m.select(F.col("n").alias("a"), F.col("m").alias("b"))
    return (
        repoint.unionAll(keep)
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    max_degree: int | None = None,
    checkpoint_every: int = 1,  # kept for API compat; rounds always checkpoint
) -> DataFrame:
    """Return DF[node, comp] where comp = min node id reachable from node.

    ``edges`` is an undirected pair list (each pair listed once is
    enough; duplicate/reversed/self-loop rows are tolerated). Node ids
    must be orderable (bigint or string). Isolated nodes don't appear in
    an edge list, so they don't appear in the output — callers that need
    every corpus row join back with how='left' + coalesce (see
    keep_representatives).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).filter(
        F.col("s").isNotNull() & F.col("d").isNotNull() & (F.col("s") != F.col("d"))
    )
    if max_degree is not None:
        deg = (
            e.select(F.col("s").alias("n"))
            .unionAll(e.select(F.col("d").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") > max_degree)
            .select("n")
        )
        e = e.join(deg, e.s == deg.n, "left_anti").drop("n")
        e = e.join(deg, e.d == deg.n, "left_anti").drop("n")
    cur = (
        e.select(F.least("s", "d").alias("u"), F.greatest("s", "d").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        nxt = _star_round(_star_round(cur, large=True), large=False)
        nxt = nxt.localCheckpoint(eager=True)
        # fixpoint = the canonical edge set is unchanged (a star forest:
        # every edge is (component-min, member))
        changed = (
            nxt.exceptAll(cur).limit(1).count()
            + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            "(pathological input?); labels may be split",
            stacklevel=2,
        )
    # star forest -> assignment: members point at their rep; each rep
    # gets a self row. The groupBy-min guarantees ONE row per node even
    # on the non-converged warning path (a half-contracted edge set can
    # name a node under two parents; the old label-propagation contract
    # was one-label-per-node and downstream joins rely on it)
    members = cur.select(F.col("v").alias("node"), F.col("u").alias("comp"))
    reps = cur.select(F.col("u").alias("node"), F.col("u").alias("comp"))
    return (
        members.unionAll(reps).groupBy("node").agg(F.min("comp").alias("comp"))
    )


def dedup_clusters(pairs: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """DF[doc_id, rep_id]: the canonical representative (min id) of each
    near-dup cluster; docs absent from pairs are their own representative
    implicitly (left out here — join with how='left' + coalesce to apply)."""
    comp = connected_components(pairs, src=src, dst=dst)
    return comp.select(F.col("node").alias("doc_id"), F.col("comp").alias("rep_id"))


def keep_representatives(docs: DataFrame, pairs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Training-data dedup tail: drop every near-dup that is not its
    cluster's representative."""
    reps = dedup_clusters(pairs, src="a", dst="b")
    joined = docs.join(reps, on=key, how="left")
    return (
        joined.filter(F.col("rep_id").isNull() | (F.col("rep_id") == F.col(key)))
        .drop("rep_id")
    )
