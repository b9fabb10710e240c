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
    label_t = labels.schema["label"].dataType
    for _ in range(max_iter):
        # The node's PREVIOUS label rides the union as a tagged column
        # (round 12): each node has exactly one self row, so
        # min("__self") recovers it inside the SAME min-label
        # aggregation — and the convergence check becomes a map-only
        # scan of the round's checkpoint instead of a second join of
        # the new labels against the old (one join + shuffle per round
        # removed, guide §2.4; label propagation itself is unchanged).
        self_rows = labels.select(
            "a", "label", F.col("label").alias("__self")
        )
        nbr = sym.join(labels, on="a").select(
            F.col("b").alias("a"),
            "label",
            F.lit(None).cast(label_t).alias("__self"),
        )
        new = (
            self_rows.unionByName(nbr)
            .groupBy("a")
            .agg(
                F.min("label").alias("label"),
                F.min("__self").alias("__old"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.where(F.col("label") != F.col("__old")).limit(1).count()
        )
        labels = new.select("a", "label")
        if changed == 0:
            return labels.select(F.col("a").alias("node"),
                                 F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Canonicalization: collapse each near-dup cluster to ONE surviving
    document and pass unclustered documents through — the final step of
    the dedup pipeline (pairs → components → survivors), producing the
    actual training corpus.

    Representative rule, deterministic and engine-portable: highest
    ``quality_col`` wins, ties broken by smallest ``id_col`` — a window
    rank, identical semantics in any SQL engine, so the oracle can
    replay the selection exactly (no arg_max tie ambiguity).

    Scale shape: the window partitions by cluster (dedup clusters are
    small blobs — no skew concern), the pass-through side is a
    left-anti join on the cluster membership table, which at 100 TB is
    orders of magnitude smaller than the corpus (only docs with ≥1
    near-dup edge appear in it).

    Output: (doc_id, quality_col, is_cluster_rep) — one row per
    surviving document.
    """
    from pyspark.sql import Window

    member = clusters.select(id_col, "cluster")
    scored = member.join(docs.select(id_col, quality_col), id_col)
    w = Window.partitionBy("cluster").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    reps = (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(id_col, quality_col, F.lit(True).alias("is_cluster_rep"))
    )
    singles = docs.join(member, id_col, "left_anti").select(
        id_col, quality_col, F.lit(False).alias("is_cluster_rep")
    )
    return singles.unionByName(reps)


def cluster_split(
    docs: DataFrame,
    clusters: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-free train/val/test split: the assignment unit is the
    near-dup CLUSTER, not the document — two near-duplicates can never
    land in different splits, so the test set cannot leak into training
    through paraphrase-level copies (the contamination mode document-
    level hash splits miss entirely).

    ``clusters`` is the (doc_id, cluster) membership table from
    ``connected_components``; unclustered docs become singleton
    clusters labeled by their own id. Assignment is the deterministic
    md5-bucket rule of ``hash_split`` applied to the cluster label —
    reproducible, growth-stable (a cluster keeps its split as it gains
    members), and oracle-replayable.

    Scale shape: one left join against the membership table (small —
    only docs with ≥1 near-dup edge) plus a scan-stage projection; no
    extra shuffle beyond the join.

    Output: (doc_id, cluster, split).
    """
    from myasynstreamjoin_spark.functions.pipeline import hash_split

    labeled = (
        docs.select(id_col)
        .join(clusters.select(id_col, "cluster"), id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster", F.col(id_col)).alias("cluster"),
        )
    )
    return hash_split(
        labeled,
        "cluster",
        splits or {"train": 0.8, "val": 0.1, "test": 0.1},
    ).select(id_col, "cluster", "split")
