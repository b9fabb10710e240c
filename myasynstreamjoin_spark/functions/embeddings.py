"""Embedding-column maintenance ops: L2 normalization and int8 scalar
quantization.

Beyond-reference surface (SURVEY.md §7 phase 5): the storage-side
counterparts of functions/similarity.py. A 100 TB embedding corpus is
dominated by vector bytes; normalizing once at ingest turns every
cosine into a dot product (similarity.py skips two norms per pair),
and symmetric int8 quantization cuts storage and scan I/O 4× at a
bounded recall cost.

All math is `F.transform` / `F.aggregate` lambda expressions over
ARRAY columns — JVM-side, no Python, map-only (no shuffle), with
float→double promotion before any arithmetic so the DuckDB oracle
reproduces results bit-for-bit (see similarity.py's float handling
note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.similarity import dot


def l2_normalize(
    embs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """Unit-normalize each vector; zero vectors yield an all-null
    vector rather than a division error (ANSI mode: x/0.0 is NULL-safe
    for doubles but we make the intent explicit).

    Output: (id, norm, unit) — rounded for oracle hash stability.
    """
    v = F.col(vec_col)
    norm = F.sqrt(dot(v, v))
    # zip against array_repeat(norm) rather than capturing `norm` in a
    # transform lambda: higher-order lambdas re-evaluate captured outer
    # expressions per ELEMENT (no CSE in interpreted HOFs), turning the
    # O(d) norm into O(d²) per row — invisible at d=64, ruinous at
    # production embedding widths. array_repeat evaluates norm once.
    unit = F.zip_with(
        v,
        F.array_repeat(norm, F.size(v)),
        lambda x, nrm: F.round(x.cast("double") / nrm, decimals),
    )
    return embs.select(
        F.col(id_col),
        F.round(norm, decimals).alias("norm"),
        unit.alias("unit"),
    )


def quantize_int8(
    embs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    q_i = round(x_i · scale) ∈ [-127, 127]. The per-vector scale rides
    along so a reader can dequantize (and so the error is bounded by
    max|x|/254 per element regardless of vector magnitude).

    Output: (id, scale, q).
    """
    v = F.col(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = F.lit(127.0) / amax
    # zip, don't capture: see l2_normalize — a captured `scale` would
    # re-run the O(d) max-abs aggregate once per element.
    q = F.zip_with(
        v,
        F.array_repeat(scale, F.size(v)),
        lambda x, s: F.round(x.cast("double") * s).cast("int"),
    )
    return embs.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        q.alias("q"),
    )
