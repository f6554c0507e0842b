"""Connected components over an edge list — the transitive-closure step
that turns near-duplicate PAIRS (minhash/simhash/embedding candidates,
operators/dedup.py) into canonical CLUSTER ids.

The greedy policy in ``minhash_dedup`` ("drop id_b of every confirmed
pair") is a fine keep/drop rule but is NOT transitive: pairs (A,C),(B,C)
keep both A and B even though they share a cluster through C.  Cluster
analytics (cluster sizes, one-representative-per-cluster exports,
cross-snapshot cluster tracking) need the actual components; this module
computes them with the iterative min-label-propagation ("hash-min")
algorithm expressed as DataFrame joins:

    label(n) ← min(label(n), min over neighbors m of label(m))

repeated until no label changes.  Each iteration is one equi-join + one
groupBy — both shuffles on the node id, partial-aggregated map-side.
Convergence takes O(graph diameter) iterations; near-duplicate clusters
are shallow (diameter ≤ ~3: docs similar to a common hub), so 3-5
iterations settle real dedup workloads.  For adversarially long chain
graphs the round count grows with the chain; the remedy at scale is the
alternating large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), which converges in
O(log n) rounds — the iteration STRUCTURE here (loop of joins over a
checkpointed frame) is exactly what that drop-in replacement needs, so
the upgrade path is local to this function.

Iterative-Spark hygiene (what makes loops survive at scale):

* ``localCheckpoint(eager=True)`` after every label update — truncates
  the lineage chain that would otherwise grow one join+agg per round and
  blow up the planner (and any recovery recomputation) by round 10.
* The symmetrized adjacency is persisted once and reused every round.
* Convergence is detected with one small count() per round on the
  changed-label frame — driver-side scalars, never collect()ing labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "attach_components"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node appearing in ``edges`` with the MINIMUM node id of
    its connected component (undirected; direction of input pairs is
    ignored, self-loops dropped).  Returns (node, component).

    Deterministic: min-id labeling is unique for a given edge set, so any
    correct algorithm — including the driver oracle's recursive-CTE
    closure — produces the identical table.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence (pathologically deep graph: raise the cap, or switch the
    loop body to large-star/small-star as per the module docstring).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            nbr_min = (
                und.join(
                    labels.select(F.col("node").alias("b"), F.col("label").alias("_bl")),
                    "b",
                )
                .groupBy("a")
                .agg(F.min("_bl").alias("_nmin"))
                .withColumnRenamed("a", "node")
            )
            new_labels = (
                labels.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(F.col("label"), F.coalesce("_nmin", "label")).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.select("node", F.col("label").alias("_new"))
                .join(labels, "node")
                .where(F.col("_new") != F.col("label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select("node", F.col("label").alias("component"))
    finally:
        und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations — "
        "graph diameter exceeds the cap; raise max_iter or use a "
        "large-star/small-star contraction for deep graphs"
    )


def attach_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    out_col: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """Convenience wrapper for the dedup pipeline: label every row of
    ``df`` with its near-dup cluster id (min member id), singletons —
    rows in no pair — labeling themselves.  ``pairs`` is any (id_a, id_b)
    candidate/verified-pair frame from operators/dedup.py."""
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter).select(
        F.col("node").alias(id_col), F.col("component").alias("_cc_label")
    )
    return (
        df.join(comp, id_col, "left")
        .withColumn(out_col, F.coalesce("_cc_label", F.col(id_col)))
        .drop("_cc_label")
    )
