"""Product quantization (functions/embeddings.py::pq_encode):
determinism, code validity, and quantization-error monotonicity in the
codebook size — the invariants that hold for any correct PQ trainer
regardless of float-summation order (which is why the contract query is
rows-only rather than oracle-hashed)."""

from __future__ import annotations

import math
import random

from myasynstreamjoin_spark.functions.embeddings import pq_encode

N_SUB, DIM = 2, 8


def _embs(spark, n=60, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codes_valid_and_deterministic(spark):
    rows, embs = _embs(spark)
    out1 = sorted(
        ((r.vec_id, tuple(r.codes), r.recon_err) for r in pq_encode(
            embs, n_sub=N_SUB, k=4, n_iters=3).collect())
    )
    out2 = sorted(
        ((r.vec_id, tuple(r.codes), r.recon_err) for r in pq_encode(
            embs, n_sub=N_SUB, k=4, n_iters=3).collect())
    )
    assert out1 == out2
    assert len(out1) == len(rows)
    for _, codes, err in out1:
        assert len(codes) == N_SUB
        assert all(0 <= c < 4 for c in codes)
        assert err >= 0.0


def test_pq_error_monotone_in_k(spark):
    """More codewords per subspace → no worse total reconstruction
    error (k=1 collapses to the subspace mean)."""
    _, embs = _embs(spark)

    def total_err(k):
        return sum(
            r.recon_err for r in pq_encode(embs, n_sub=N_SUB, k=k, n_iters=3).collect()
        )

    e1, e4, e16 = total_err(1), total_err(4), total_err(16)
    assert e4 <= e1 + 1e-9
    assert e16 <= e4 + 1e-9
    assert e16 < e1  # strictly better somewhere on random data


def test_pq_exact_on_separable_clusters(spark):
    """Vectors drawn at exactly k distinct points per subspace encode
    with ~zero reconstruction error."""
    pts = [[float(a)] * (DIM // 2) + [float(b)] * (DIM // 2)
           for a in (0, 10) for b in (0, 10)]
    rows = [(i, pts[i % 4]) for i in range(40)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_encode(embs, n_sub=2, k=4, n_iters=5).collect()
    assert len(out) == 40
    assert all(math.isclose(r.recon_err, 0.0, abs_tol=1e-9) for r in out)


def test_pq_topk_exact_on_separable(spark):
    """On k-separable data ADC distances are exact, so ADC top-k ==
    exact-L2 top-k."""
    pts = [[float(a)] * (DIM // 2) + [float(b)] * (DIM // 2)
           for a in (0, 10) for b in (0, 10)]
    rows = [(i, pts[i % 4]) for i in range(40)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from myasynstreamjoin_spark.functions.embeddings import pq_topk

    out = pq_topk(embs, n_queries=2, k_neighbors=5, n_sub=2, k=4, n_iters=5).collect()
    byq = {}
    for r in out:
        byq.setdefault(r.qid, []).append(r)
    for qid, rs in byq.items():
        qv = pts[qid % 4]
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv, v)), i)
            for i, v in rows if i != qid
        )[:5]
        got = sorted((r.adc_d2, r.vec_id) for r in rs)
        assert [i for _, i in got] == [i for _, i in exact]
        for (d_got, _), (d_exact, _) in zip(got, exact):
            assert abs(d_got - d_exact) < 1e-6


def test_pq_topk_recall_floor(spark):
    """ADC recall@10 vs exact L2 on random data: ≥ 0.5 with a 16-word
    4-subspace codebook (empirically ~0.7+; floor pinned loosely so the
    test guards regressions, not noise)."""
    rows, embs = _embs(spark, n=120)
    from myasynstreamjoin_spark.functions.embeddings import pq_topk

    out = pq_topk(embs, n_queries=3, k_neighbors=10, n_sub=2, k=16, n_iters=4).collect()
    vecs = dict(rows)
    hits = total = 0
    for qid in {r.qid for r in out}:
        qv = vecs[qid]
        exact = {
            i for _, i in sorted(
                (sum((a - b) ** 2 for a, b in zip(qv, v)), i)
                for i, v in rows if i != qid
            )[:10]
        }
        got = {r.vec_id for r in out if r.qid == qid}
        hits += len(exact & got)
        total += 10
    assert hits / total >= 0.5
