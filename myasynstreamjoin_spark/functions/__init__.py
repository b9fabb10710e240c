from myasynstreamjoin_spark.functions import (
    bpe,
    cluster,
    dedup,
    dsir,
    embeddings,
    json_ops,
    multimodal,
    pipeline,
    retrieval,
    similarity,
    text,
    udtf_ops,
)

__all__ = [
    "text",
    "bpe",
    "udtf_ops",
    "dedup",
    "dsir",
    "similarity",
    "multimodal",
    "cluster",
    "embeddings",
    "json_ops",
    "pipeline",
    "retrieval",
]
