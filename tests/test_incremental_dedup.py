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


def test_append_voids_index_sort_trust_until_rebuild(spark):
    """write_bucketed(single_file_per_bucket=True) claims appends
    correctly VOID the within-bucket sort trust (multi-file buckets
    break the guarantee Spark's bucketedTableScan.outputOrdering conf
    relies on) and a rebuild restores it. Pin that on the delta join's
    executed plan: fresh index -> the SMJ has NO index-side Sort (one
    Sort total, on the delta); after an append -> the index-side Sort
    REAPPEARS (two Sorts); after an overwrite rebuild -> gone again.
    The graph edge table pins the same invariant on its side
    (test_pagerank_iteration_join_has_no_edge_side_sort); this is the
    dedup-index half (round-11 verdict #7)."""
    tbl = "test_fp_index_append_trust"
    corpus = _docs(
        spark,
        [(i, f"doc number {i} text", "web") for i in range(8)],
    )
    delta = _docs(spark, [(100, "a new delta doc", "web")])
    tmp = tempfile.mkdtemp(prefix="fp_trust_")

    def n_sorts() -> tuple[int, str]:
        key = "spark.sql.autoBroadcastJoinThreshold"
        prev = spark.conf.get(key)
        spark.conf.set(key, "-1")
        try:
            plan = (
                incremental_dedup(delta, tbl)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set(key, prev)
        return plan.count("Sort ["), plan

    try:
        write_fingerprint_index(
            corpus, tbl, n_buckets=4, path=os.path.join(tmp, "v1")
        )
        n, plan = n_sorts()
        assert n == 1, f"fresh single-file index should sort ONLY the delta:\n{plan}"

        more = _docs(spark, [(50, "appended corpus doc", "web")])
        write_fingerprint_index(more, tbl, n_buckets=4, mode="append")
        n, plan = n_sorts()
        assert n == 2, (
            "append made buckets multi-file; the index-side sort must "
            f"come back or the SMJ would merge unsorted runs:\n{plan}"
        )

        # rebuild at a fresh path (overwrite at the live external
        # location is refused by design) restores the trusted layout
        rebuilt = corpus.unionByName(more)
        write_fingerprint_index(
            rebuilt, tbl, n_buckets=4, path=os.path.join(tmp, "v2")
        )
        n, plan = n_sorts()
        assert n == 1, f"rebuilt index should drop the index-side sort:\n{plan}"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_single_file_per_bucket_assert_detects_multifile(spark):
    """assert_single_file_per_bucket passes on a fresh
    single-file-per-bucket write and raises once an append lands a
    second file in a bucket (round-11 advice: the guarantee rests on
    implicit partitioning propagation, so regressions must fail
    loudly, not silently degrade into per-join sorts)."""
    from myasynstreamjoin_spark.sources.sinks import (
        assert_single_file_per_bucket,
    )

    tbl = "test_fp_index_filecheck"
    docs = _docs(spark, [(i, f"text {i}", "web") for i in range(6)])
    tmp = tempfile.mkdtemp(prefix="fp_filecheck_")
    try:
        write_fingerprint_index(
            docs, tbl, n_buckets=2, path=os.path.join(tmp, "idx")
        )  # overwrite mode runs the assert internally — must not raise
        assert_single_file_per_bucket(spark, tbl)
        write_fingerprint_index(
            _docs(spark, [(60, "more text", "web")]),
            tbl, n_buckets=2, mode="append",
        )
        with pytest.raises(AssertionError, match="multiple files"):
            assert_single_file_per_bucket(spark, tbl)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


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


# ---------------------------------------------------------------------------
# MinHash band index (near-dup incremental path)
# ---------------------------------------------------------------------------

MH_TABLE = "test_mh_index"


@pytest.fixture(scope="module")
def mh_setup(spark, sf_dir):
    from myasynstreamjoin_spark.sources.tables import load_table
    from myasynstreamjoin_spark.functions.dedup import write_minhash_index

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    tmp = tempfile.mkdtemp(prefix="mh_index_")
    write_minhash_index(corpus, MH_TABLE, n_buckets=4, path=tmp)
    yield docs, delta
    spark.sql(f"DROP TABLE IF EXISTS {MH_TABLE}")
    spark.sql(f"DROP TABLE IF EXISTS {MH_TABLE}_sh")


def test_index_probe_equals_batch_cross_pairs(spark, mh_setup):
    """Ingesting the odd half against the even-half index must find
    EXACTLY the cross-parity pairs the batch operator finds over the
    full corpus — same band scheme, same signatures, same verify — so
    index probing loses nothing vs a full recompute."""
    from myasynstreamjoin_spark.functions.dedup import (
        minhash_lsh_pairs,
        neardup_against_index,
    )

    docs, delta = mh_setup
    got = {
        (r["doc_new"], r["doc_old"], r["jaccard"])
        for r in neardup_against_index(
            delta, MH_TABLE, threshold=0.2
        ).collect()
    }
    batch = minhash_lsh_pairs(docs, verify_threshold=0.2).collect()
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        if r["doc_a"] % 2 == 1
        else (r["doc_b"], r["doc_a"], r["jaccard"])
        for r in batch
        if r["doc_a"] % 2 != r["doc_b"] % 2
    }
    assert got == want
    assert got, "fixture corpus has no cross-parity near-dups: vacuous"


def test_band_probe_corpus_side_is_exchange_free(spark, mh_setup):
    """The band-probe join must shuffle ONLY the delta: the bands
    table arrives bucket-partitioned on bh. A second hash exchange
    means the corpus index is being reshuffled per ingest — the exact
    cost the persisted index exists to delete."""
    from myasynstreamjoin_spark.functions.dedup import (
        banded_signature_rows,
        minhash_signatures,
        shingle_docs,
    )

    _, delta = mh_setup
    sh = shingle_docs(delta, 3, hashed=True)
    sigs = minhash_signatures(delta, 32, 3, shingled=sh, pre_hashed=True)
    rows = banded_signature_rows(sigs, 8, 4)
    probe = rows.join(
        spark.table(MH_TABLE).withColumnRenamed("doc_id", "doc_old"), "bh"
    )
    # At test scale the optimizer just broadcasts the tiny delta (zero
    # hash exchanges — also corpus-safe). Disable broadcast to pin the
    # at-scale shape: sort-merge against the bucketed index with the
    # ONE exchange on the delta side.
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        plan = probe._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, prev)
    assert plan.count("Exchange hashpartitioning") == 1, plan
