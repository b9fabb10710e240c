"""foreachBatch adaptive loop (T9) and IVF similarity properties."""

from __future__ import annotations

from myasynstreamjoin_spark.config import DEFAULT_CONFIG as CFG
from myasynstreamjoin_spark.functions.similarity import cosine_topk, ivf_topk
from myasynstreamjoin_spark.operators.grouping import count_per_key
from myasynstreamjoin_spark.sources import fixtures, tables
from myasynstreamjoin_spark.streaming.feedback import adaptive_count_stream


def test_adaptive_stream_matches_batch_counts(spark, sf_dir):
    merged, decisions = adaptive_count_stream(spark, sf_dir, CFG, lam=1.0)
    got = {tuple(r) for r in merged.collect()}
    expected = {
        tuple(r)
        for r in count_per_key(fixtures.keyed_values(spark, sf_dir, CFG)).collect()
    }
    assert got == expected
    assert decisions and all(d["strategy"] in (0, 1) for d in decisions)


def test_ivf_topk_properties(spark, sf_dir):
    emb = tables.load_table(spark, sf_dir, "embeddings")
    exact = [tuple(r) for r in cosine_topk(emb, query_id=0, k=10).collect()]
    approx = [tuple(r) for r in ivf_topk(emb, query_id=0, k=10, n_lists=16, nprobe=4).collect()]
    assert len(approx) == 10
    # scores are a subset of the scan, so the approximate best can never
    # beat the exact best
    assert approx[0][1] <= exact[0][1]
    # full probe == exact search
    full = [tuple(r) for r in ivf_topk(emb, query_id=0, k=10, n_lists=16, nprobe=16).collect()]
    assert full == exact
