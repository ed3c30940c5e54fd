"""Connected components over near-duplicate pairs (training-data dedup).

Near-dup detection (neardup.py: MinHash/SimHash/Jaccard) emits PAIRS; a
training-data pipeline needs CLUSTERS — transitively closed groups — so
one representative per cluster can be kept. This is iterative min-label
propagation (Pregel-lite) on the DataFrame API:

    comp(v) <- min(comp(v), min over neighbors comp(u))   until fixpoint

Scale notes:
- dedup graphs are near-degenerate: millions of tiny components, diameter
  rarely >3-4, so the loop converges in a handful of iterations;
- each iteration is one join + one groupBy on (edge, label) — both shuffle
  on the node key; labels persist per iteration and the previous iteration
  is unpersisted (bounded memory, bounded lineage via localCheckpoint);
- a skewed super-node (one doc near-duping everything) is an input-quality
  signal; AQE skew-join handles the shuffle, and `max_degree` optionally
  drops super-nodes first (standard dedup hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    max_degree: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Return DF[node, comp] where comp = min node id reachable from node.

    ``edges`` is an undirected pair list (each pair listed once is enough).
    Node ids must be orderable (bigint or string).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).filter(
        F.col("s") != F.col("d")
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
    sym = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    sym = sym.distinct().persist()

    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    labels.count()

    for i in range(max_iter):
        # candidate label for each node: min label among its neighbors
        cand = (
            sym.join(labels, sym.d == labels.node)
            .select(F.col("s").alias("node"), F.col("comp").alias("ncomp"))
            .groupBy("node")
            .agg(F.min("ncomp").alias("ncomp"))
        )
        new_labels = (
            labels.join(cand, on="node", how="left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # cut the lineage: iterative plans otherwise grow without bound
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} iterations "
            "(a component has larger diameter); labels may be split",
            stacklevel=2,
        )
    sym.unpersist()
    # hand back a checkpointed, UNpersisted frame: the result stays cheap
    # to re-scan (no loop re-execution) without leaking cached partitions
    # the caller never knows to unpersist
    out = labels.localCheckpoint(eager=True)
    labels.unpersist()
    return out


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
