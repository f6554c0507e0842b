"""Connected components (operators/graph.py): correctness on known
topologies, convergence behavior, and the dedup attach path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurisprudencia_privada_etl_spark.operators.graph import attach_components, connected_components


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
        _cc(spark, [(i, i + 1) for i in range(1, 9)], max_iter=1)


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
