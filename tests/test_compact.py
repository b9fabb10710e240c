"""Small-file compaction (functions/pipeline.py::compact_plan /
compact_shards / compacted_manifest): deterministic contiguous bin
assignment with the next-fit budget bound, lossless rewrite proven by
the order-free checksum, and directory pruning on the compacted tree.
DuckDB parity of the full round trip is covered by test_oracle_parity
(q_compact_shards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.pipeline import (
    compact_plan,
    compact_shards,
    compacted_manifest,
    export_shards,
    shard_manifest,
)
from myasynstreamjoin_spark.sources.tables import load_table

N_SHARDS = 16
BUDGET = 2048


def _export(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "shards")
    export_shards(docs, src, n_shards=N_SHARDS)
    return docs, src


def test_plan_bins_are_contiguous_dense_and_budget_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    manifest = shard_manifest(docs, n_shards=N_SHARDS)
    plan = compact_plan(manifest, BUDGET).orderBy("shard").collect()
    assert [r["shard"] for r in plan] == sorted(r["shard"] for r in plan)
    bins = [r["bin"] for r in plan]
    # dense from 0, non-decreasing in shard order → contiguous ranges
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # next-fit bound: every bin under budget + the largest shard
    max_shard = max(r["n_tokens"] for r in plan)
    totals: dict[int, int] = {}
    for r in plan:
        totals[r["bin"]] = totals.get(r["bin"], 0) + r["n_tokens"]
    assert all(t < BUDGET + max_shard for t in totals.values())
    # a bin is only opened because the previous one reached the budget
    for b in sorted(totals)[:-1]:
        assert totals[b] >= BUDGET - max_shard


def test_compaction_is_lossless_and_checksum_conserving(
    spark, sf_dir, tmp_path
):
    docs, src = _export(spark, sf_dir, tmp_path)
    dst = str(tmp_path / "compacted")
    plan = compact_shards(spark, src, dst, budget_tokens=BUDGET)
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # per-bin manifest == source shard manifest rolled up via the plan
    # (the checksum is an associative integer sum, so equality proves
    # nothing was dropped or duplicated in the rewrite)
    got = {
        r["bin"]: (r["n_shards"], r["n_docs"], r["n_tokens"], r["checksum"])
        for r in compacted_manifest(spark, dst).collect()
    }
    want_rows = (
        shard_manifest(docs, n_shards=N_SHARDS)
        .join(plan.select("shard", "bin"), "shard")
        .groupBy("bin")
        .agg(
            F.countDistinct("shard").alias("n_shards"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("checksum").alias("checksum"),
        )
        .collect()
    )
    want = {
        r["bin"]: (r["n_shards"], r["n_docs"], r["n_tokens"], r["checksum"])
        for r in want_rows
    }
    assert got == want
    assert len(got) > 1  # the budget actually split the corpus


def test_compacted_tree_prunes_on_bin(spark, sf_dir, tmp_path):
    _, src = _export(spark, sf_dir, tmp_path)
    dst = str(tmp_path / "compacted")
    compact_shards(spark, src, dst, budget_tokens=BUDGET)
    pruned = spark.read.parquet(dst).where(F.col("bin") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition pruning: only the bin=0 directory is scanned
    assert "PartitionFilters: [isnotnull(bin" in plan or "bin#" in plan
    files = pruned.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    assert all("bin=0" in r["f"] for r in files)


def test_compaction_is_deterministic(spark, sf_dir, tmp_path):
    _, src = _export(spark, sf_dir, tmp_path)
    d1, d2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    p1 = compact_shards(spark, src, d1, budget_tokens=BUDGET)
    p2 = compact_shards(spark, src, d2, budget_tokens=BUDGET)
    assert sorted(map(tuple, p1.collect())) == sorted(map(tuple, p2.collect()))
    m1 = sorted(map(tuple, compacted_manifest(spark, d1).collect()))
    m2 = sorted(map(tuple, compacted_manifest(spark, d2).collect()))
    assert m1 == m2
