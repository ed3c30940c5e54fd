"""Connected components (operators/graph.py): the alternating
large-star/small-star engine vs a pure-Python union-find oracle on
seeded random graphs, chain-shaped worst cases the old label-propagation
engine could not finish, and the end-to-end near-dup clustering tail."""

import random

import pytest
from pyspark.sql import functions as F

from rap_etl_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    keep_representatives,
)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in range(n_nodes)}


def _spark_assign(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["comp"]
        for r in connected_components(df).collect()
    }


@pytest.mark.parametrize("seed,n,m", [(1, 40, 25), (2, 200, 150), (3, 120, 240)])
def test_cc_matches_union_find_on_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    truth = _uf_components(n, edges)
    got = _spark_assign(spark, edges)
    touched = {x for e in edges if e[0] != e[1] for x in e}
    for x in range(n):
        if x not in touched:
            assert x not in got  # isolated: absent by contract
            continue
        assert got[x] == truth[x], f"node {x}: {got[x]} != {truth[x]}"


def test_cc_long_chain_converges_fast(spark):
    # a 512-node chain has diameter 511 — naive label propagation needs
    # ~511 rounds; the star algorithm must finish inside the 25-round cap
    edges = [(i, i + 1) for i in range(511)]
    got = _spark_assign(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 512


def test_cc_handles_dups_self_loops_and_orientation(spark):
    edges = [(5, 3), (3, 5), (5, 5), (3, 5), (7, 9)]
    got = _spark_assign(spark, edges)
    assert got == {3: 3, 5: 3, 7: 7, 9: 7}


def test_cc_max_degree_drops_super_nodes(spark):
    # node 0 touches everything (a boilerplate doc); with the hygiene cap
    # it is dropped and the remaining pair stands alone
    edges = [(0, i) for i in range(1, 6)] + [(10, 11)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["comp"]
        for r in connected_components(df, max_degree=3).collect()
    }
    assert got == {10: 10, 11: 10}


def test_neardup_clusters_end_to_end_from_minhash_pairs(spark):
    """Planted duplicate families through the REAL pair detector: three
    exact copies of each base doc must land in ONE cluster whose
    representative is the base id, and untouched docs survive dedup."""
    from rap_etl_spark.operators.neardup import minhash_near_dups

    base = [
        (i, " ".join(f"w{i}x{j}" for j in range(20)))
        for i in range(10)
    ]
    copies = [
        (i + offset, text)
        for (i, text) in base
        if i % 2 == 0
        for offset in (100, 200)
    ]
    docs = spark.createDataFrame(base + copies, "doc_id long, text string")
    pairs = minhash_near_dups(docs, threshold=0.5)
    reps = {
        r["doc_id"]: r["rep_id"] for r in dedup_clusters(pairs).collect()
    }
    for i in range(0, 10, 2):
        assert reps[i] == i and reps[i + 100] == i and reps[i + 200] == i
    kept = {r["doc_id"] for r in keep_representatives(docs, pairs).collect()}
    assert kept == set(range(10))


def test_cc_no_collect_list_in_plan(spark):
    """Scale pin: the star rounds must aggregate with min(), never
    materialize per-node adjacency lists (collect_list turns a hub node
    into a single-task OOM)."""
    from rap_etl_spark.operators.graph import _star_round

    df = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    plan = (
        _star_round(df, large=True)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "collect_list" not in plan
    assert "collect_set" not in plan
