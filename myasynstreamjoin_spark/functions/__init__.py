from myasynstreamjoin_spark.functions import (
    cluster,
    dedup,
    embeddings,
    json_ops,
    multimodal,
    pipeline,
    retrieval,
    similarity,
    text,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "cluster",
    "embeddings",
    "json_ops",
    "pipeline",
    "retrieval",
]
