"""Training-corpus export (functions/pipeline.py::export_shards +
shard_manifest): deterministic shard assignment and within-shard
order, directory pruning on read, and manifest/file agreement —
manifest parity with DuckDB is covered by test_oracle_parity
(q_shard_manifest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.dedup import md5_32
from myasynstreamjoin_spark.functions.pipeline import (
    export_shards,
    shard_manifest,
)
from myasynstreamjoin_spark.functions.text import normalized
from myasynstreamjoin_spark.sources.tables import load_table

N_SHARDS = 8


def test_export_round_trips_and_matches_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    export_shards(docs, path, n_shards=N_SHARDS)
    back = spark.read.parquet(path)
    # nothing dropped, nothing duplicated, schema = source + shard only
    # (the internal sort_key must NOT leak into the export)
    assert sorted(back.columns) == sorted(docs.columns + ["shard"])
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # the written tree reproduces the manifest exactly
    from_files = (
        back.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("text").isNull(), F.lit(0)).otherwise(
                    F.size(F.split(F.trim(F.lower("text")), r"\s+"))
                ).cast("long")
            ).alias("n_tokens"),
            F.sum(
                md5_32(normalized(F.coalesce("text", F.lit(""))))
            ).alias("checksum"),
        )
    )
    a = sorted(tuple(r) for r in from_files.collect())
    b = sorted(
        tuple(r) for r in shard_manifest(docs, n_shards=N_SHARDS).collect()
    )
    assert a == b


def test_shard_filter_prunes_directories(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    export_shards(docs, path, n_shards=N_SHARDS)
    one = spark.read.parquet(path).where(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the shard predicate must appear in the scan's PartitionFilters
    # clause (directory pruning), not as a post-scan data filter
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "shard" in pf and "= 3" in pf
    files = one.select(F.col("_metadata.file_path")).distinct().collect()
    assert len(files) >= 1
    assert all("shard=3" in r[0] for r in files)


def test_within_shard_order_is_deterministic_shuffle(spark, sf_dir, tmp_path):
    """Rows inside each shard file are ordered by the md5 shuffle key —
    re-exporting produces byte-identical row order, and the order is
    NOT doc_id order (it's a shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    export_shards(docs, p1, n_shards=N_SHARDS)
    export_shards(docs, p2, n_shards=N_SHARDS)
    a = [r["doc_id"] for r in spark.read.parquet(p1)
         .where(F.col("shard") == 0).collect()]
    b = [r["doc_id"] for r in spark.read.parquet(p2)
         .where(F.col("shard") == 0).collect()]
    assert a == b and len(a) > 2
    assert a != sorted(a)


def test_export_epoch_row_order_is_the_permutation(spark, sf_dir, tmp_path):
    """The written files' row order must equal the epoch permutation:
    shard_rank is dense ascending in file order, and the recomputed
    order-sensitive checksum matches epoch_shuffle_manifest's."""
    from myasynstreamjoin_spark.functions.pipeline import (
        _EPOCH_CHECKSUM_MOD,
        epoch_shuffle_manifest,
        export_epoch,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "epoch1")
    export_epoch(docs, path, seed=1, n_shards=N_SHARDS)
    back = spark.read.parquet(path)
    assert sorted(back.columns) == sorted(
        docs.columns + ["shard", "shard_rank"]
    )
    assert back.count() == docs.count()
    manifest = {
        r["shard"]: r
        for r in epoch_shuffle_manifest(
            docs, seed=1, n_shards=N_SHARDS
        ).collect()
    }
    for shard in range(N_SHARDS):
        rows = spark.read.parquet(f"{path}/shard={shard}").collect()
        # file order IS rank order (single file per shard dir)
        ranks = [r["shard_rank"] for r in rows]
        assert ranks == list(range(1, len(rows) + 1))
        checksum = sum(
            r["shard_rank"] * (r["doc_id"] % _EPOCH_CHECKSUM_MOD)
            for r in rows
        )
        assert checksum == manifest[shard]["order_checksum"]
        assert len(rows) == manifest[shard]["n_docs"]
    # a different seed writes a different permutation of the same corpus
    path2 = str(tmp_path / "epoch2")
    export_epoch(docs, path2, seed=2, n_shards=N_SHARDS)
    b2 = spark.read.parquet(path2)
    assert b2.count() == docs.count()
    o1 = [r["doc_id"] for r in
          spark.read.parquet(f"{path}/shard=0").collect()]
    o2 = [r["doc_id"] for r in
          spark.read.parquet(f"{path2}/shard=0").collect()]
    assert o1 != o2
