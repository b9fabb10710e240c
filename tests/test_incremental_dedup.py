"""Incremental exact dedup against a persisted fingerprint index
(functions/dedup.py::write_fingerprint_index / incremental_dedup).

The 100 TB ingest pattern: the corpus pays its fingerprint shuffle ONCE
(bucketed index write); every later delta dedups via a bucket-local
join plus a sort-only window — the corpus is never rescanned and the
delta never shuffles twice. These tests pin (a) the tagging semantics
against a brute-force model, (b) the append-then-rededup steady state,
and (c) the one-exchange plan.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.dedup import (
    incremental_dedup,
    incremental_dedup_summary,
    write_fingerprint_index,
)

TABLE = "test_fp_index"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


@pytest.fixture()
def index_table(spark):
    corpus = _docs(
        spark,
        [
            (0, "alpha beta gamma", "web"),
            (2, "delta epsilon", "web"),
            (4, "  Alpha   BETA gamma ", "book"),  # normalizes to doc 0
        ],
    )
    tmp = tempfile.mkdtemp(prefix="fp_index_")
    write_fingerprint_index(
        corpus, TABLE, n_buckets=4, path=os.path.join(tmp, "idx")
    )
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_index_is_distinct_min_survivor(spark, index_table):
    idx = {r["fp"]: r["keep_id"] for r in spark.table(index_table).collect()}
    # 3 corpus docs, 2 distinct contents (0 and 4 normalize together)
    assert len(idx) == 2
    assert sorted(idx.values()) == [0, 2]


def test_tagging_matches_brute_force(spark, index_table):
    delta = _docs(
        spark,
        [
            (11, "alpha beta gamma", "web"),   # in index -> dup_index
            (13, "zeta eta", "web"),           # fresh, first -> kept
            (15, "ZETA   eta", "book"),        # dup of 13 -> dup_within
            (17, "theta iota", "book"),        # fresh -> kept
            (19, "delta epsilon", "web"),      # in index -> dup_index
        ],
    )
    tagged = incremental_dedup(delta, index_table)
    got = {r["doc_id"]: r["status"] for r in tagged.collect()}
    assert got == {
        11: "dup_index",
        13: "kept",
        15: "dup_within",
        17: "kept",
        19: "dup_index",
    }
    summ = {
        r["source"]: (r["n_new"], r["n_dup_index"], r["n_dup_within"],
                      r["n_kept"], r["kept_id_sum"])
        for r in incremental_dedup_summary(tagged).collect()
    }
    assert summ == {"web": (3, 2, 0, 1, 13), "book": (2, 0, 1, 1, 17)}


def test_append_then_rededup_drops_everything(spark, index_table):
    """Steady state: admit a delta, append its kept fps, re-ingest the
    same delta — every row must now be dup_index (exactly-once
    admission across batches)."""
    delta = _docs(
        spark,
        [(21, "kappa lambda", "web"), (23, "mu nu xi", "book")],
    )
    tagged = incremental_dedup(delta, index_table)
    kept = tagged.filter(F.col("status") == "kept")
    assert kept.count() == 2
    write_fingerprint_index(
        kept, index_table, n_buckets=4, mode="append"
    )
    again = incremental_dedup(delta, index_table)
    assert {r["status"] for r in again.collect()} == {"dup_index"}


def test_delta_pays_exactly_one_exchange(spark, index_table):
    """The index side is bucketed on fp and the within-delta window
    rides the join's fp partitioning, so the whole tagging plan holds
    ONE shuffle exchange (the delta's) — a second one means the window
    or the join stopped reusing the partitioning and the op would
    rescan-shuffle at corpus scale."""
    delta = _docs(spark, [(31, "omicron pi", "web")])
    plan = (
        incremental_dedup(delta, index_table)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, plan
