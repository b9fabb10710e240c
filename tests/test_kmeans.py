"""Invariants for the iterative distributed k-means (no SQL oracle —
DuckDB can't replay Lloyd iterations; correctness is pinned by
properties instead)."""

from __future__ import annotations

from myasynstreamjoin_spark.functions.similarity import kmeans_fit
from myasynstreamjoin_spark.sources.tables import load_table


def test_kmeans_partitions_all_vectors_and_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    r1 = {r.cell: (r.n_vectors, r.inertia) for r in kmeans_fit(emb, k=4).collect()}
    assert sum(v[0] for v in r1.values()) == n
    assert set(r1) <= set(range(4))
    r2 = {r.cell: (r.n_vectors, r.inertia) for r in kmeans_fit(emb, k=4).collect()}
    assert r1 == r2


def test_kmeans_iterations_do_not_increase_inertia(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    i1 = sum(r.inertia for r in kmeans_fit(emb, k=4, n_iters=1).collect())
    i5 = sum(r.inertia for r in kmeans_fit(emb, k=4, n_iters=5).collect())
    assert i5 <= i1 + 1e-6
