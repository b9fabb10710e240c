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


def test_multi_query_ann_and_recall(spark, sf_dir):
    from myasynstreamjoin_spark.functions.similarity import (
        ann_recall,
        cosine_topk,
        cosine_topk_multi,
        ivf_topk_multi,
    )
    from myasynstreamjoin_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3]

    # batched exact == per-query exact, for each query in the batch
    multi = cosine_topk_multi(emb, qids, k=5)
    for qid in qids:
        single = {(r[0], r[1]) for r in cosine_topk(emb, query_id=qid, k=5).collect()}
        batch = {
            (r["vec_id"], r["cos"])
            for r in multi.where(multi["query_id"] == qid).collect()
        }
        assert batch == single, f"batched exact diverges for query {qid}"

    # IVF with nprobe == n_lists probes everything: recall must be 1
    full = ivf_topk_multi(emb, qids, k=5, n_lists=8, nprobe=8)
    exact_ids = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk_multi(emb, qids, k=5).collect()
    }
    full_ids = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert full_ids == exact_ids

    # recall metric: sane range, and multi-table LSH beats the
    # single-table collision floor ((1-θ/π)^planes ≈ 0.1)
    row = ann_recall(emb, qids, k=10).collect()[0]
    assert row["n_queries"] == len(qids)
    assert 0.0 <= row["recall_lsh"] <= 1.0 and 0.0 <= row["recall_ivf"] <= 1.0
    assert row["recall_lsh"] >= 0.3, f"multi-table LSH recall too low: {row}"
    assert row["recall_ivf"] >= 0.5, f"IVF recall too low: {row}"


def test_multiprobe_lsh_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe candidates are a superset of the single-probe
    bucket, so recall@k vs exact can only improve; probing every
    plane's flip must recover at least the 2-probe recall."""
    from myasynstreamjoin_spark.functions.similarity import (
        cosine_topk,
        cosine_topk_lsh,
        cosine_topk_lsh_multiprobe,
    )
    from myasynstreamjoin_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {r["vec_id"] for r in cosine_topk(emb, query_id=0, k=10).collect()}

    def recall(df):
        got = {r["vec_id"] for r in df.collect()}
        return len(got & exact) / len(exact)

    r1 = recall(cosine_topk_lsh(emb, query_id=0, k=10, n_planes=4))
    r2 = recall(cosine_topk_lsh_multiprobe(emb, query_id=0, k=10, n_planes=4, probes=2))
    r_all = recall(
        cosine_topk_lsh_multiprobe(emb, query_id=0, k=10, n_planes=4, probes=4)
    )
    assert r2 >= r1, f"multi-probe lost recall: {r2} < {r1}"
    assert r_all >= r2
    assert r2 > 0.0


def test_filtered_topk_is_exact_under_the_filter(spark, sf_dir):
    """Pre-filtered vector search == brute force over the passing
    subset; the query probes even when its own doc fails the filter;
    and the semi-join happens BEFORE scoring (pre-filter plan)."""
    from pyspark.sql import functions as F

    from myasynstreamjoin_spark.functions.similarity import (
        cosine_topk,
        cosine_topk_filtered,
    )

    emb = tables.load_table(spark, sf_dir, "embeddings")
    docs = tables.load_table(spark, sf_dir, "documents")
    pred = F.col("doc_id") % 3 == 1  # deterministic ~1/3 filter
    got = [
        tuple(r)
        for r in cosine_topk_filtered(
            emb, docs, pred, query_id=0, k=5
        ).collect()
    ]
    # reference: brute-force top-k over the manually filtered subset,
    # query vector injected from the full table
    keep = {r["doc_id"] for r in docs.where(pred).collect()}
    subset = emb.where(
        F.col("vec_id").isin([0] + sorted(keep))
    )
    want = [
        tuple(r) for r in cosine_topk(subset, query_id=0, k=5).collect()
    ]
    want = [t for t in want if t[0] in keep][:5]
    assert got == want
    assert len(got) == 5
    # query_id=0 fails pred (0 % 3 == 0) yet still probed; it never
    # appears as a result
    assert all(r[0] % 3 == 1 for r in got)


def test_matryoshka_recall_invariants(spark, sf_dir):
    """Every (query, truncation) row present; overlaps bounded by k;
    a near-full truncation (63 of 64 dims) keeps recall high; passing
    the full dim as a 'truncation' is rejected (it is the reference
    ranking, not a variant)."""
    import pytest

    from myasynstreamjoin_spark.functions.similarity import matryoshka_recall
    from myasynstreamjoin_spark.sources import tables

    emb = tables.load_table(spark, sf_dir, "embeddings")
    out = matryoshka_recall(emb, dims=(8, 32, 63), k=10).collect()
    rows = {(r["query_id"], r["dim"]): r for r in out}
    assert set(rows) == {(q, d) for q in (0, 1, 2, 3) for d in (8, 32, 63)}
    for (q, d), r in rows.items():
        assert 0 <= r["n_overlap"] <= 10
        assert r["topk_id_sum"] > 0
        if d == 63:
            # dropping one of 64 components barely moves the ranking
            assert r["n_overlap"] >= 8
    with pytest.raises(ValueError, match="full dim"):
        matryoshka_recall(emb, dims=(8, 64), k=10)
