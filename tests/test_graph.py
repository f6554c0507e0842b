"""Connected components (operators/graph.py): correctness on known
topologies, convergence behavior, and the dedup attach path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.graph import (
    _star_contraction,
    attach_components,
    connected_components,
)


def _cc(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(edges, **kw).collect()
    }


def test_two_components_and_direction_ignored(spark):
    # component {1,2,3} (2->1, 3->2 reversed) and {10,11}
    got = _cc(spark, [(2, 1), (2, 3), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_deeper_than_one_hop(spark):
    """A 7-node chain needs several propagation rounds — exercises the
    iteration + lineage-truncation path, not just one join."""
    chain = [(i, i + 1) for i in range(1, 7)]
    got = _cc(spark, chain)
    assert got == {i: 1 for i in range(1, 8)}


def test_hub_join_of_clusters(spark):
    """The case the greedy pair-drop policy gets wrong: (1,5) and (3,5)
    share a component only through the hub 5."""
    got = _cc(spark, [(1, 5), (3, 5)])
    assert got == {1: 1, 3: 1, 5: 1}


def test_self_loops_and_duplicate_edges(spark):
    got = _cc(spark, [(1, 1), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(1, 9)], max_iter=1, local_threshold=0)


def test_star_equals_propagation_on_seeded_graphs(spark):
    """Property test: the large-star/small-star contraction and min-label
    propagation emit the IDENTICAL (node, component) table — min-id
    labeling is unique, so any divergence is a bug in one of them.
    Seeded topology mix: random sparse, chain, hub stars, disjoint
    cliques, plus duplicate/reversed/self-loop edges."""
    import random

    rng = random.Random(20260820)
    for trial in range(5):
        n = rng.randint(8, 60)
        edges = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(rng.randint(4, 2 * n))]
        if trial == 1:  # pure chain — propagation's worst case
            edges = [(i, i + 1) for i in range(n)]
        if trial == 2:  # two hubs bridged
            edges = [(0, i) for i in range(1, n // 2)] + [(n, i) for i in range(n // 2, n)] + [(1, n - 1)]
        edges += [(e[1], e[0]) for e in edges[: len(edges) // 3]]  # reversed dups
        edges += [(5, 5)]  # self loop
        prop = _cc(spark, edges, algorithm="propagation", max_iter=200)
        star = _cc(spark, edges, algorithm="star", max_iter=200, local_threshold=0)
        local = _cc(spark, edges, algorithm="star", max_iter=200)  # small-graph union-find path
        assert star == prop, f"trial {trial}: star != propagation"
        assert local == prop, f"trial {trial}: local union-find != propagation"


def test_star_converges_in_log_rounds_on_path_graph(spark):
    """The scale pin from VERDICT r04: on a path graph — propagation's
    O(n)-round worst case — the contraction must settle in O(log n)
    rounds.  A 256-node path would take ~128 propagation rounds; the
    star contraction gets ≤ 12 (2·log2(256) + slack)."""
    n = 256
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    labels, rounds = _star_contraction(edges, max_rounds=20, local_threshold=0)
    assert rounds <= 12, f"contraction took {rounds} rounds on a {n}-path"
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_attach_components_labels_singletons(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 4), (1, 3)], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in attach_components(df, pairs, "doc_id").collect()
    }
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2, 5: 5}
    # original columns survive
    df2 = df.withColumn("text", F.lit("x"))
    cols = attach_components(df2, pairs, "doc_id").columns
    assert set(cols) == {"doc_id", "text", "component"}
