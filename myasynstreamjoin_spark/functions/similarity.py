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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


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


def ivf_assign(
    embeddings: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index: partition vectors into n_lists cells
    by nearest centroid.

    Centroids are the n_lists lowest-id vectors — a deterministic
    seeding (k-means|| would refine them; one Lloyd iteration is a
    cheap follow-up, but cell *assignment*, not centroid quality, is
    what the scale path needs). Assignment is a broadcast cross-join +
    argmax-by-cosine, all column expressions.

    Returns ``(assigned, centroids)`` where assigned = embeddings +
    ``ivf_cell`` and centroids = (cell, centroid vector). At 100 TB the
    cell becomes a partition/bucket key so a probe prunes the scan to
    nprobe/n_lists of the data.
    """
    w_id = F.col(id_col)
    centroids = (
        embeddings.orderBy(w_id).limit(n_lists)
        .select(w_id.alias("cell_seed"), F.col(vec_col).alias("cvec"))
        .withColumn("cell", F.row_number().over(Window.orderBy("cell_seed")) - 1)
        .select("cell", "cvec")
    )
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col,
        F.struct(cosine(F.col(vec_col), F.col("cvec")).alias("cos"),
                 (-F.col("cell")).alias("neg_cell")).alias("__sc"),
        "cell",
    )
    best = scored.groupBy(id_col).agg(F.max("__sc").alias("best"))
    assigned = (
        embeddings.join(best, id_col)
        .select(id_col, vec_col, (-F.col("best.neg_cell")).cast("int").alias("ivf_cell"))
    )
    return assigned, centroids


def ivf_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via IVF: rank centroids by similarity to the
    query, keep the nprobe best cells, exact-rerank only vectors in
    those cells. Recall grows with nprobe (nprobe = n_lists ⇒ exact).

    Output: (vec_id, cos).
    """
    assigned, centroids = ivf_assign(embeddings, n_lists, vec_col, id_col)
    q = embeddings.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("__q"))
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select("cell", cosine(F.col("cvec"), F.col("__q")).alias("ccos"))
        .orderBy(F.desc("ccos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    return (
        assigned.join(F.broadcast(probe_cells), assigned["ivf_cell"] == F.col("cell"))
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .select(id_col, F.round(cosine(F.col(vec_col), F.col("__q")), 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


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
    # Persisted: both sides of the self-join read it, and the bucket
    # projection (n_planes dot products per row) is the expensive part.
    bucketed = with_lsh_bucket(embeddings, dim, n_planes, seed, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
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
