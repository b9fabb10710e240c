"""Persisted IVF index (functions/similarity.py::write_ivf_index /
ivf_search_index / append_ivf_index).

The point of persisting: probing nprobe of n_lists cells must become
PARTITION PRUNING — the scan opens only the probed cells' files — and
the pruned search must return EXACTLY what the inline ivf_topk_multi
computes (same centroids, same rounding, same tie rules).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.similarity import (
    append_ivf_index,
    assign_to_centroids,
    ivf_search_index,
    ivf_topk_multi,
    write_ivf_index,
)
from myasynstreamjoin_spark.sources.tables import load_table

TABLE = "test_ivf_index"
QUERY_IDS = [0, 1, 2, 3]


def _query_vecs(embeddings, ids):
    return embeddings.where(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q")
    )


@pytest.fixture(scope="module")
def ivf_table(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    write_ivf_index(emb, TABLE, n_lists=16, path=tempfile.mkdtemp())
    yield emb
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}_centroids")


def test_index_search_equals_inline_ivf(spark, ivf_table):
    emb = ivf_table
    got = sorted(
        tuple(r) for r in ivf_search_index(
            spark, TABLE, _query_vecs(emb, QUERY_IDS), k=10, nprobe=4
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivf_topk_multi(
            emb, QUERY_IDS, k=10, n_lists=16, nprobe=4
        ).collect()
    )
    assert got == want
    assert len(got) == 4 * 10


def test_probe_prunes_partitions(spark, ivf_table):
    """A 4-of-16-cell probe must open at most 4 cells' files: the
    isin partition filter has to prune the scan, or the persisted
    index degenerates into a full-corpus read per query."""
    full_files = set(spark.table(TABLE).inputFiles())
    probed = spark.table(TABLE).where(F.col("ivf_cell").isin([0, 3, 7, 11]))
    probed_files = set(probed.inputFiles())
    assert probed_files < full_files
    # files live under ivf_cell=N/ dirs; the probe reads only those 4
    cells_read = {
        seg for f in probed_files for seg in f.split("/")
        if seg.startswith("ivf_cell=")
    }
    assert cells_read <= {f"ivf_cell={c}" for c in (0, 3, 7, 11)}


def test_append_assigns_against_frozen_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    t = "test_ivf_append"
    write_ivf_index(half, t, n_lists=8, path=tempfile.mkdtemp())
    try:
        append_ivf_index(rest, t)
        assert spark.table(t).count() == emb.count()
        # appended rows sit in exactly the cells the frozen sidecar
        # centroids assign them to
        want = {
            (r["vec_id"], r["ivf_cell"])
            for r in assign_to_centroids(
                rest, spark.table(f"{t}_centroids")
            ).collect()
        }
        got = {
            (r["vec_id"], r["ivf_cell"])
            for r in spark.table(t)
            .where(F.col("vec_id") % 2 == 1)
            .select("vec_id", "ivf_cell")
            .collect()
        }
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}_centroids")
