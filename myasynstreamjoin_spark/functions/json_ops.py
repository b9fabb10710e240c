"""Semi-structured (JSON) column handling.

Beyond-reference surface: the reference's record grammar is positional
space-split text (SURVEY.md §1); it has no semi-structured path at all.
A real event feed carries a JSON properties blob, so the engine
provides typed extraction.

Scale design: `from_json` with an EXPLICIT schema, not schema
inference — inference is a second full pass over 100 TB and makes the
output schema data-dependent. The parse is a JVM-side expression
(Jackson inside codegen, no Python), the struct is pruned to the
fields actually referenced (Catalyst's CreateNamedStruct pruning), and
malformed rows yield NULL (PERMISSIVE) rather than failing the job —
the count of NULL parses is part of the output, because silent drop
rates are a data-quality signal a pipeline must see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def props_stats(
    events: DataFrame,
    json_col: str = "props",
    schema: str = "k INT",
    field: str = "k",
    group_col: str = "event_type",
) -> DataFrame:
    """Per group: count, null-parse count, and sum/min/max of a typed
    field extracted from a JSON column.

    Output: (group, n_rows, n_bad, sum_field, min_field, max_field).
    """
    k = F.from_json(F.col(json_col), schema)[field]
    return (
        events.select(group_col, k.alias("__k"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("__k").isNull(), 1).otherwise(0)).cast("long").alias("n_bad"),
            F.sum("__k").cast("long").alias("sum_k"),
            F.min("__k").cast("int").alias("min_k"),
            F.max("__k").cast("int").alias("max_k"),
        )
    )


def props_stats_variant(
    events: DataFrame,
    json_col: str = "props",
    path: str = "$.k",
    group_col: str = "event_type",
) -> DataFrame:
    """`props_stats`' VARIANT twin (Spark 4's semi-structured type):
    ``try_parse_json`` ingests the blob ONCE into the binary VARIANT
    encoding with no up-front schema, and typing happens at EXTRACTION
    (``try_variant_get`` with a JSON path) — the open-schema lakehouse
    pattern for event properties whose fields drift, where
    ``from_json`` would need a schema migration per drift. Malformed
    blobs become NULL variants (counted, like the from_json path —
    silent drop rates are a data-quality signal).

    Same output contract as `props_stats`, so the two paths share one
    oracle and can never diverge semantically:
    (group, n_rows, n_bad, sum_k, min_k, max_k).
    """
    v = F.expr(f"try_parse_json({json_col})")
    k = F.try_variant_get(v, path, "int")
    return (
        events.select(group_col, k.alias("__k"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("__k").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_bad"),
            F.sum("__k").cast("long").alias("sum_k"),
            F.min("__k").cast("int").alias("min_k"),
            F.max("__k").cast("int").alias("max_k"),
        )
    )
