"""connected_components: known topologies — a chain (tests multi-round
propagation), a separate triangle, an isolated edge — and the
convergence guard."""

from __future__ import annotations

import pytest

from myasynstreamjoin_spark.functions.cluster import connected_components


def test_components_topologies(spark):
    edges = spark.createDataFrame(
        [
            # chain 1-2-3-4-5: min label must travel 4 hops
            (2, 1), (2, 3), (3, 4), (5, 4),
            # triangle 10-11-12 with a redundant edge
            (10, 11), (11, 12), (10, 12),
            # isolated edge
            (100, 101),
        ],
        "x long, y long",
    )
    out = connected_components(edges, src="x", dst="y")
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        100: 100, 101: 100,
    }


def test_components_nonconvergence_raises(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "x long, y long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, src="x", dst="y", max_iter=1)


def test_cluster_split_no_leakage(spark):
    """Every member of a cluster gets the cluster's split; singletons
    split by their own id; fractions roughly honored."""
    from myasynstreamjoin_spark.functions.cluster import cluster_split
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # clusters: {0..4}→0, {10,11}→10
    members = [(i, 0) for i in range(5)] + [(10, 10), (11, 10)]
    cc = spark.createDataFrame(members, "doc_id long, cluster long")
    out = cluster_split(docs, cc)
    per_cluster = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert per_cluster == 0
    assert out.count() == 200
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    assert "train" in splits
