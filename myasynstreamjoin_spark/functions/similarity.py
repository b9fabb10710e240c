"""Similarity search over embedding columns (ARRAY<FLOAT>).

Beyond-reference surface (SURVEY.md §7 phase 5):
- brute-force cosine top-k — the exact baseline; one pass over the
  table, dot products in whole-stage codegen (zip_with + aggregate on
  doubles, no Python).
- LSH-bucketed ANN (random hyperplanes) — the scale path: signatures
  partition the table so a query probes one bucket (plus optional
  multi-probe neighbors) instead of scanning 100 TB.
- embedding-cosine near-duplicate pairs via the same buckets.

Float handling: elements are cast to DOUBLE before any arithmetic so
results are reproducible against the DuckDB oracle (single-precision
accumulation would drift).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (oracle-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to the row ``query_id``.

    The query vector is a one-row broadcast joined against the table —
    no collect, so the same plan works when `embeddings` is 100 TB
    (a full scan, which is what exact search costs by definition).
    Ties broken by id for determinism.

    Output: (vec_id, cos) — cos rounded for hash stability.
    """
    q = embeddings.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__q")), 4).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def _random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a sign-LSH bucket id: bit i = [vec · plane_i > 0].

    2^n_planes buckets; cosine-close vectors collide with high
    probability (hyperplane LSH). The planes are literal arrays baked
    into the plan — tiny, deterministic, no side channel.
    """
    planes = _random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot(F.col(vec_col), plane) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("long")
    return embeddings.withColumn("lsh_bucket", bucket)


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact
    rerank inside it. Recall < 1 by construction; n_planes trades
    bucket selectivity against recall. At 100 TB the bucket column is
    a partition/bucketing key so the probe prunes the scan.

    Output: (vec_id, cos).
    """
    bucketed = with_lsh_bucket(embeddings, dim, n_planes, seed, vec_col)
    q = bucketed.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q"), F.col("lsh_bucket").alias("__qb")
    )
    scored = (
        bucketed.join(F.broadcast(q), F.col("lsh_bucket") == F.col("__qb"))
        .where(F.col(id_col) != query_id)
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__q")), 4).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def exact_embedding_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact embedding-cosine pair search: every pair with
    round(cos, 4) ≥ threshold. O(n²) by definition — this is the
    correctness baseline the LSH variant (`embedding_neardup_pairs`)
    approximates; at scale use that one, this one oracles it.

    Output: (id_a, id_b, cos) with id_a < id_b.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs are
    only compared within a bucket (plus nothing else — multi-probe
    would raise recall at 2× cost), so the join is bucket-local instead
    of a full cross product.

    Output: (id_a, id_b, cos) with id_a < id_b, cos ≥ threshold.
    """
    bucketed = with_lsh_bucket(embeddings, dim, n_planes, seed, vec_col)
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "lsh_bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "lsh_bucket"
    )
    return (
        a.join(b, "lsh_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
