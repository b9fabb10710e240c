"""PySpark-native analytics engine with the query semantics of
Angryrou/MyAsynStreamJoin, re-expressed Spark-first.

The reference (/root/reference) is a Spark-2.0 DStream research codebase
for load-balanced partitioning of asynchronous (event-time) stream joins
and grouped aggregation. This engine keeps its *query semantics* —
multi-source windowed min-count "async join", grouped aggregation,
heavy-hitter / skew statistics, star-join cardinality, punctuation-style
watermark emission — and implements them on DataFrame / Catalyst /
Structured Streaming, plus the large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
training-data pipeline needs.

Layout:
    config      engine configuration (reference stream.json equivalent)
    session     SparkSession factory tuned for scale (AQE, skew join)
    sources     table loaders + fixture derivations + raw-grammar codec
    operators   relational/streaming-semantic operators (agg, join, skew)
    functions   column-level libraries (text, dedup, similarity, multimodal)
    streaming   Structured Streaming versions (watermark, stateful)
    plans       plan-inspection helpers (pushdown/broadcast assertions)
"""

from myasynstreamjoin_spark.config import EngineConfig
from myasynstreamjoin_spark.session import get_spark, prepare_session

__all__ = ["EngineConfig", "get_spark", "prepare_session"]
