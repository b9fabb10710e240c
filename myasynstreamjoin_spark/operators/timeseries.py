"""Time-series similarity search over the event stream.

The similarity-search surface (functions/similarity.py) works on dense
stored vectors; this operator builds the vectors FROM the stream —
per-user activity series over time buckets — and finds similar users,
the streaming-data similarity-search shape (cf. "Time Series
Similarity Search for Streaming Data in Distributed Systems",
EDBT 2019; PAPERS.md).

Design: the series are SPARSE (most users are inactive in most
buckets), so cosine similarity is computed relationally — a self-join
on the bucket key (only co-active buckets pair up), a dot-product
aggregate, and per-user norms — never by materializing dense vectors.
At 100 TB this is one shuffle on bucket (hot buckets are ordinary agg
skew, AQE-handled), one on the user pair; the dense-vector alternative
is O(users × buckets) memory and a quadratic cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_cosine_pairs(
    events: DataFrame,
    bucket_ms: int = 86_400_000,
    threshold: float = 0.5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """User pairs whose bucketed activity series have cosine similarity
    ≥ threshold. Series = sum(value) per (user, ts-bucket); ts is
    epoch-ns (the engine's logical time model, normalized at load by
    sources.tables.normalize_epoch_ns).

    Output: (user_a, user_b, cos_sim) with user_a < user_b.
    """
    bucket = (F.col(ts_col) / F.lit(1_000_000)).cast("long") / F.lit(bucket_ms)
    s = (
        events.select(
            F.col(user_col).alias("u"),
            bucket.cast("long").alias("b"),
            F.col(value_col).alias("v"),
        )
        .groupBy("u", "b")
        .agg(F.sum("v").alias("sv"))
    )
    norms = s.groupBy("u").agg(F.sqrt(F.sum(F.col("sv") * F.col("sv"))).alias("nrm"))
    a = s.select(F.col("u").alias("user_a"), "b", F.col("sv").alias("va"))
    bb = s.select(F.col("u").alias("user_b"), "b", F.col("sv").alias("vb"))
    dots = (
        a.join(bb, "b")
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("u").alias("user_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("u").alias("user_b"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dots.join(na, "user_a")
        .join(nb, "user_b")
        .where(cos >= threshold)
        .select("user_a", "user_b", F.round(cos, 6).alias("cos_sim"))
    )
