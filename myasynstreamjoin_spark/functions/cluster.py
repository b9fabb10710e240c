"""Connected components over a pair/edge list — the step that turns
near-duplicate PAIRS (minhash/jaccard/embedding, functions/dedup.py and
similarity.py) into dedup CLUSTERS, so a pipeline can keep one survivor
per group of transitively-linked documents.

Iterative min-label propagation: every node repeatedly adopts the
smallest label among itself and its neighbors; fixpoint = components.
Rounds scale with component diameter — the right trade for dedup
graphs, whose components are small and dense (a near-dup cluster of a
document is a clique-ish blob, diameter 2-3). For adversarially long
chains the literature's large-star/small-star alternation (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) gets
O(log n) rounds; deliberately not implemented until a workload needs
it.

Spark-iterative hygiene: each round ends in localCheckpoint(eager) —
without it the lineage doubles per round and the driver re-plans an
exponentially growing DAG; with it each round is one shuffle of the
(node, label) table joined against the (static, re-used) edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the smallest
    node id in its component. Output: (node, component).

    Raises RuntimeError if ``max_iter`` rounds don't converge — a
    signal the graph needs the log-round variant, never silently wrong
    labels.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # static per-round probe side
    )
    labels = sym.select("a").distinct().withColumn("label", F.col("a"))
    for _ in range(max_iter):
        nbr = sym.join(labels, on="a").select(F.col("b").alias("a"), "label")
        new = (
            labels.unionByName(nbr)
            .groupBy("a")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "old"), on="a")
            .where(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels.select(F.col("a").alias("node"),
                                 F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
