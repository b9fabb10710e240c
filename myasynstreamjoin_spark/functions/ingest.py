"""Composed ingest admission gate: the ops a 100 TB corpus runs on
every arriving batch, chained in the order a real pipeline runs them —

  1. blocklist gate   (map-only wordlist scan; offenders never reach
                       the dedup shuffles),
  2. exact dedup      against the persisted fingerprint index
                       (bucket-local, ``incremental_dedup``),
  3. near-dup         against the persisted MinHash band index
                       (``neardup_against_index``; kept docs only —
                       exact dups are already gone, so the signature
                       pass runs on the smallest possible set).

Each stage is individually oracle-verified elsewhere
(q_blocklist / q_dedup_incremental / q_neardup_incremental); this
module proves they COMPOSE — stage order is semantics (a blocked doc
must not count as a duplicate; an exact dup must not reach the
near-dup probe), and the composed oracle (q_ingest_e2e) replays the
full decision per document.

Scale: the corpus-side cost of the whole gate is zero exchanges — both
indexes are bucketed/pre-built; every shuffle is delta- or
candidate-sized. The blocklist stage is map-only and runs FIRST
because it is the cheapest reject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_gate(
    new_docs: DataFrame,
    fp_table: str,
    mh_table: str,
    terms: list[str],
    max_hits: int = 0,
    neardup_threshold: float = 0.5,
    replayable: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Tag every delta document with its admission fate, first
    matching gate wins: ``blocked`` → ``dup_exact`` → ``dup_within``
    → ``dup_near`` → ``admitted``.

    Output: (doc_id, source, status).
    """
    from myasynstreamjoin_spark.functions.dedup import (
        incremental_dedup,
        neardup_against_index,
    )
    from myasynstreamjoin_spark.functions.text import blocklist_hits

    blocked = (
        blocklist_hits(new_docs, terms, text_col)
        .groupBy("doc_id")
        .agg(F.sum("n_hits").alias("__h"))
        .where(F.col("__h") > max_hits)
        .select("doc_id")
    )
    pass1 = new_docs.join(blocked, "doc_id", "left_anti")
    tagged = incremental_dedup(pass1, fp_table, text_col)
    kept = tagged.where(F.col("status") == "kept").drop("fp", "status")
    near = (
        neardup_against_index(
            kept,
            mh_table,
            threshold=neardup_threshold,
            replayable=replayable,
        )
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
    )
    return (
        new_docs.select("doc_id", "source")
        .join(blocked.withColumn("__b", F.lit(True)), "doc_id", "left")
        .join(
            tagged.select("doc_id", F.col("status").alias("__ex")),
            "doc_id",
            "left",
        )
        .join(near.withColumn("__n", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("__b"), F.lit("blocked"))
            .when(F.col("__ex") == "dup_index", F.lit("dup_exact"))
            .when(F.col("__ex") == "dup_within", F.lit("dup_within"))
            .when(F.col("__n"), F.lit("dup_near"))
            .otherwise(F.lit("admitted"))
            .alias("status"),
        )
    )


def ingest_summary(gated: DataFrame, by: str = "source") -> DataFrame:
    """Per-group admission report over ``ingest_gate`` output, with an
    exact integer checksum of the admitted doc_ids so an oracle
    verifies WHICH documents were admitted.

    Output: (by, n_in, n_blocked, n_dup_exact, n_dup_within,
    n_dup_near, n_admitted, admitted_id_sum).
    """
    def n(status: str, name: str):
        return (
            F.sum((F.col("status") == status).cast("long"))
            .cast("long")
            .alias(name)
        )

    return gated.groupBy(by).agg(
        F.count("*").cast("long").alias("n_in"),
        n("blocked", "n_blocked"),
        n("dup_exact", "n_dup_exact"),
        n("dup_within", "n_dup_within"),
        n("dup_near", "n_dup_near"),
        n("admitted", "n_admitted"),
        F.sum(
            F.when(F.col("status") == "admitted", F.col("doc_id")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("admitted_id_sum"),
    )
