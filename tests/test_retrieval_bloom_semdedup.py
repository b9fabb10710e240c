"""Unit invariants for this round's corpus operators: BM25 retrieval,
vocabulary stats, Bloom-prefiltered decontamination, and SemDeDup-style
semantic near-dup pairs. (Value-level parity vs DuckDB is covered by
test_oracle_parity.py; these pin the operator-level guarantees the
oracle can't express — e.g. that the Bloom prefilter is
correctness-neutral at ANY false-positive rate.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.dedup import bloom_decontaminate, shingle_docs
from myasynstreamjoin_spark.functions.retrieval import bm25_topk, vocab_stats
from myasynstreamjoin_spark.functions.similarity import (
    cosine,
    semantic_dedup_pairs,
)

BENCH = ("src0", "src1")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def exact_survivors(docs, k=8):
    """Ground truth: string-level gram anti-join, no Bloom anywhere."""
    g = shingle_docs(docs, k, hashed=False)
    train = docs.where(~F.col("source").isin(*BENCH))
    bg = (
        g.join(docs.where(F.col("source").isin(*BENCH)), "doc_id", "left_semi")
        .select(F.explode_outer("sh").alias("gram"))
        .distinct()
    )
    tg = g.join(train, "doc_id", "left_semi").select(
        "doc_id", F.explode_outer("sh").alias("gram")
    )
    contaminated = tg.join(bg, "gram", "left_semi").select("doc_id").distinct()
    return train.select("doc_id").join(contaminated, "doc_id", "left_anti")


@pytest.mark.parametrize("m_bits,n_hashes", [(1 << 17, 4), (1 << 8, 2)])
def test_bloom_equals_exact_antijoin(docs, m_bits, n_hashes):
    """The Bloom is a prefilter only: even a saturated 256-bit filter
    (every membership test ~always positive) must verify false
    positives away and return the exact anti-join."""
    got = bloom_decontaminate(
        docs.where(~F.col("source").isin(*BENCH)),
        docs.where(F.col("source").isin(*BENCH)),
        k=8,
        m_bits=m_bits,
        n_hashes=n_hashes,
    )
    want = exact_survivors(docs)
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_bm25_topk_bound_and_order(docs):
    rows = bm25_topk(docs, ["the", "data", "model"], k=5).collect()
    assert len(rows) <= 5
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_unmatched_query_is_empty(docs):
    assert bm25_topk(docs, ["zzzznotaword"], k=5).count() == 0


def test_vocab_stopword_flag_consistent(docs):
    n_docs = docs.count()
    rows = vocab_stats(docs, top_n=20, stopword_df_ratio=0.5).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.stopword == (r.df / n_docs > 0.5)
        assert r.tf >= r.df >= 1


def test_semantic_dedup_invariants(embs):
    thr = 0.3
    pairs = semantic_dedup_pairs(embs, n_seeds=4, threshold=thr).collect()
    seed_ids = {r.vec_id for r in embs.orderBy("vec_id").limit(4).collect()}
    for r in pairs:
        assert r.id_a < r.id_b
        assert r.cos >= thr
        assert r.cluster in seed_ids
    # every emitted pair really is high-cosine (re-check against the
    # raw vectors, independent of the cluster assignment path)
    if pairs:
        a = embs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = embs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        ids = {(r.id_a, r.id_b) for r in pairs}
        recomputed = {
            (r.id_a, r.id_b): r.c
            for r in a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(cosine("va", "vb"), 4).alias("c"))
            .collect()
            if (r.id_a, r.id_b) in ids
        }
        for (ia, ib), c in recomputed.items():
            assert c >= thr, (ia, ib, c)


def test_semantic_dedup_pairs_share_cluster_only(embs):
    """Pairs straddling two clusters must not be emitted even when
    their cosine clears the threshold (bounded-work contract)."""
    pairs = semantic_dedup_pairs(embs, n_seeds=4, threshold=0.0)
    n_all = embs.count()
    assert pairs.count() < n_all * (n_all - 1) / 2


def test_semantic_dedup_arrow_kernel_equals_sql(embs):
    """The Arrow (numpy matmul) kernel must produce the same pair set
    as the oracle-checked SQL kernel; cosines may differ by numpy's
    pairwise-vs-sequential summation only (≤1e-3 after round-4)."""
    sql_rows = {
        (r.cluster, r.id_a, r.id_b): r.cos
        for r in semantic_dedup_pairs(embs, 8, 0.3, kernel="sql").collect()
    }
    ar_rows = {
        (r.cluster, r.id_a, r.id_b): r.cos
        for r in semantic_dedup_pairs(embs, 8, 0.3, kernel="arrow").collect()
    }
    assert set(sql_rows) == set(ar_rows)
    for k2, v in sql_rows.items():
        assert abs(v - ar_rows[k2]) <= 1e-3


def test_semantic_dedup_rejects_unknown_kernel(embs):
    with pytest.raises(ValueError):
        semantic_dedup_pairs(embs, 8, 0.3, kernel="nope")


def test_pagerank_invariants(spark, sf_dir):
    """Integer-microunit PageRank: ranks positive, total mass within
    floor-division loss of 1.0, degree-correlated head."""
    from myasynstreamjoin_spark.operators.graph import pagerank_copurchase

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    top = pagerank_copurchase(li, n_iters=3, k=1_000_000).collect()
    assert len(top) > 0
    assert all(r.rank > 0 for r in top)
    total = sum(r.rank for r in top)
    # floor division only ever LOSES mass, bounded by ~|nodes|+|edges|
    # micro-units per iteration
    assert 0.9 <= total <= 1.0 + 1e-9


def test_event_sequences_bound(spark, sf_dir):
    from myasynstreamjoin_spark.operators.sessions import top_event_sequences

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = top_event_sequences(ev, n=3, k=10).collect()
    assert 0 < len(rows) <= 10
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.seq.split(">")) == 3 for r in rows)


def test_embed_neardup_auto_planes_subset_of_exact(embs):
    """Auto-scaled plane count: LSH pairs are exact-verified, so every
    emitted pair must appear in the exact pair set at the same
    threshold (recall < 1 is allowed; precision must be 1)."""
    from myasynstreamjoin_spark.functions.similarity import (
        embedding_neardup_pairs,
        exact_embedding_pairs,
    )

    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(embs, threshold=0.3, n_planes=None).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in exact_embedding_pairs(embs, threshold=0.3).collect()
    }
    assert lsh <= exact


def test_semantic_dedup_arrow_preserves_double_vectors(spark):
    """array<double> input must flow through the Arrow kernel at full
    precision — the intermediate schema follows the input type, and
    the pair set still equals the SQL kernel's."""
    import pyspark.sql.functions as F

    embs = spark.range(0, 60).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.col("id") + i) % 7).cast("double") / 7.0 + 1e-9
                for i in range(8)
            ]
        ).alias("embedding"),
    )
    assert embs.schema["embedding"].dataType.simpleString() == "array<double>"
    sql_pairs = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(embs, 4, 0.9, kernel="sql").collect()
    }
    arrow_pairs = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(embs, 4, 0.9, kernel="arrow").collect()
    }
    assert arrow_pairs == sql_pairs and len(sql_pairs) > 0


def test_hybrid_fusion_rank_semantics(spark, sf_dir):
    """Fused ranks are exact integer Borda sums of the two retrievers'
    ranks; docs present in both lists dominate penalty-ranked ones at
    equal single-list position."""
    from myasynstreamjoin_spark.functions.retrieval import (
        bm25_topk,
        hybrid_fusion_topk,
    )
    from myasynstreamjoin_spark.functions.similarity import cosine_topk
    from myasynstreamjoin_spark.sources import tables

    docs = tables.load_table(spark, sf_dir, "documents")
    embs = tables.load_table(spark, sf_dir, "embeddings")
    terms = ["the", "data", "model"]
    out = hybrid_fusion_topk(docs, embs, terms, query_id=0).collect()
    assert len(out) == 10
    lex = [r.doc_id for r in bm25_topk(docs, terms, k=10)
           .orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    den = [r.vec_id for r in cosine_topk(embs, query_id=0, k=10)
           .orderBy(F.desc("cos"), F.asc("vec_id")).collect()]
    lex_rank = {d: i + 1 for i, d in enumerate(lex)}
    den_rank = {d: i + 1 for i, d in enumerate(den)}
    for r in out:
        assert r.lex_rank == lex_rank.get(r.doc_id, 11)
        assert r.dense_rank == den_rank.get(r.doc_id, 11)
        assert r.fused == r.lex_rank + r.dense_rank
    fused_all = sorted(
        (lex_rank.get(d, 11) + den_rank.get(d, 11), d)
        for d in set(lex) | set(den)
    )[:10]
    assert [(r.fused, r.doc_id) for r in sorted(
        out, key=lambda r: (r.fused, r.doc_id))] == fused_all


def test_lsh_autoscale_is_the_library_default():
    """Scale guard: the sf3 probe measured static LSH parameters as a
    latent quadratic (164.6 s vs 15.1 s) — the SAFE auto-scaling mode
    must be the library default, AND (round 8) the registered contract
    queries must ride it too: the old pinned wrappers were the
    registry's last two scale-killers, retired by regenerating their
    oracles against the auto parameterization."""
    import inspect

    import __spark_entry__ as entry_mod
    from myasynstreamjoin_spark.functions.similarity import (
        embedding_neardup_pairs,
        semantic_dedup_pairs,
    )

    assert (
        inspect.signature(embedding_neardup_pairs).parameters["n_planes"].default
        is None
    )
    assert (
        inspect.signature(semantic_dedup_pairs).parameters["n_seeds"].default
        is None
    )
    # the contract wrappers must NOT pin literals anymore — their
    # oracles recompute the auto parameters from count(*). Check the
    # CODE only (docstrings narrate the retired pins).
    import ast
    import textwrap

    def code_without_docstring(fn):
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
        body = tree.body[0].body
        if isinstance(body[0], ast.Expr) and isinstance(
            body[0].value, ast.Constant
        ):
            body = body[1:]
        return "\n".join(ast.unparse(stmt) for stmt in body)

    assert "n_planes" not in code_without_docstring(
        entry_mod._q_embed_neardup_lsh
    )
    assert "n_seeds" not in code_without_docstring(entry_mod._q_semantic_dedup)
    assert "n_seeds" not in code_without_docstring(
        entry_mod._q_semantic_dedup_arrow
    )


def test_lsh_plane_prefix_stability():
    """The auto-oracle's masking trick requires plane i of the seed-42
    generator to be IDENTICAL whatever the total plane count — randn
    fills row-major, so the k-plane set is a prefix of the k_max-plane
    literal bank baked into the oracle. If the generator ever changes
    (different RNG, transposed fill), this fails before the driver
    does."""
    import numpy as np

    from myasynstreamjoin_spark.functions.similarity import (
        _random_hyperplanes,
    )

    small = np.array(_random_hyperplanes(64, 4, 42))
    big = np.array(_random_hyperplanes(64, 24, 42))
    assert np.array_equal(small, big[:4])


def test_auto_plane_rule_is_integer_exact():
    """The engine's auto n_planes (smallest k >= 4 with 256*2^k >= N)
    must agree with ceil(log2(max(2, N/256))) — the documented rule —
    across the boundary cases the bit_length form must get right."""
    import math

    def engine_rule(n, target=256):
        m = max(2, -(-n // target))
        return max(4, (m - 1).bit_length())

    for n in [1, 2, 255, 256, 257, 511, 512, 513, 4096, 4097,
              8192, 1 << 20, (1 << 20) + 1, 10**9]:
        want = max(4, math.ceil(math.log2(max(2, n / 256))))
        assert engine_rule(n) == want, (n, engine_rule(n), want)


def test_contamination_report_per_suite_counts(spark):
    """Hand corpus: suite A leaks into two train docs, suite B into
    none — B still reports a zero row; gram hits count per-doc
    DISTINCT grams."""
    from myasynstreamjoin_spark.functions.dedup import contamination_report

    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    train = spark.createDataFrame(
        [
            (0, f"{span} tail tokens here"),
            (1, f"prefix {span}"),
            (2, "nothing shared at all in this doc"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, span, "suiteA"),
            (101, "completely different benchmark text", "suiteB"),
            (102, "another clean suite b doc", "suiteB"),
        ],
        "doc_id long, text string, bench string",
    )
    out = {r["bench"]: tuple(r)[1:] for r in
           contamination_report(train, bench, k=8).collect()}
    # suiteA: 1 bench doc; train docs 0 and 1 each share exactly the
    # one 8-gram (doc 0: positions 0..; doc 1 contains it once)
    assert out["suiteA"] == (1, 2, 2)
    assert out["suiteB"] == (2, 0, 0)


def test_semantic_decontaminate_flags_planted_leak(spark, embs):
    """A corpus vector equal to a benchmark vector must score
    max_cos = 1.0; orthogonal vectors score 0; every corpus row is
    reported exactly once."""
    from myasynstreamjoin_spark.functions.similarity import (
        semantic_decontaminate,
    )

    dim = len(embs.first()["embedding"])
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    bench = spark.createDataFrame(
        [(1000, e1)], "vec_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [(1, e1), (2, e2), (3, [-x for x in e1])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in
           semantic_decontaminate(corpus, bench, threshold=0.9).collect()}
    assert len(out) == 3
    assert out[1]["max_cos"] == 1.0 and out[1]["n_hits"] == 1
    assert out[2]["max_cos"] == 0.0 and out[2]["n_hits"] == 0
    assert out[3]["max_cos"] == -1.0 and out[3]["n_hits"] == 0
    # the real embeddings table: one row per corpus vector, no drops
    bench_sf = embs.where(F.col("vec_id") % 50 == 0)
    corpus_sf = embs.where(F.col("vec_id") % 50 != 0)
    rep = semantic_decontaminate(corpus_sf, bench_sf)
    assert rep.count() == corpus_sf.count()
    assert rep.where(F.col("max_cos") > 1.0001).count() == 0


def test_semantic_decontaminate_broadcasts_benchmark(spark, embs):
    from myasynstreamjoin_spark.functions.similarity import (
        semantic_decontaminate,
    )

    bench = embs.where(F.col("vec_id") % 50 == 0)
    corpus = embs.where(F.col("vec_id") % 50 != 0)
    plan = (
        semantic_decontaminate(corpus, bench, kernel="sql")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_decontaminate_arrow_kernel_equals_sql(embs):
    """The map-only Arrow matmul kernel must agree with the
    oracle-checked SQL crossJoin-fold per corpus vector: identical
    n_hits (flag-level equality) and max_cos within summation-order
    noise after round-4. The Arrow form is the 100 TB path — the SQL
    fold is O(|corpus|·|bench|) through codegen and took 47 min at the
    30x probe vs seconds for the matmul."""
    from myasynstreamjoin_spark.functions.similarity import (
        semantic_decontaminate,
    )

    bench = embs.where(F.col("vec_id") % 50 == 0)
    corpus = embs.where(F.col("vec_id") % 50 != 0)
    sql_rows = {
        r.vec_id: r
        for r in semantic_decontaminate(
            corpus, bench, 0.4, kernel="sql"
        ).collect()
    }
    ar_rows = {
        r.vec_id: r
        for r in semantic_decontaminate(
            corpus, bench, 0.4, kernel="arrow"
        ).collect()
    }
    assert set(sql_rows) == set(ar_rows)
    for vid, r in sql_rows.items():
        a = ar_rows[vid]
        assert r.n_hits == a.n_hits, (vid, r.n_hits, a.n_hits)
        assert abs(r.max_cos - a.max_cos) <= 1e-3, (vid, r.max_cos, a.max_cos)


def test_semantic_decontaminate_arrow_edge_cases(spark):
    """r9 hardening (ADVICE): the Arrow kernel must match the SQL
    kernel's degenerate semantics — empty benchmark yields an empty
    result (not an AxisError), a zero-norm corpus vector yields a
    NULL max_cos with n_hits=0 (Spark's Divide nulls a 0 divisor;
    numpy NaN must not leak through), a zero-norm BENCH vector's
    cosines are excluded from the max, and non-integer id columns
    pass through with their input type (no hard int64 cast)."""
    from myasynstreamjoin_spark.functions.similarity import (
        semantic_decontaminate,
    )

    vecs = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("b", [0.0, 0.0]),   # zero-norm corpus vector
            ("c", [0.6, 0.8]),
        ],
        "vec_id string, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [("x", [1.0, 0.0]), ("z", [0.0, 0.0])],  # one zero-norm bench
        "vec_id string, embedding array<double>",
    )
    for kernel in ("sql", "arrow"):
        got = {
            r.vec_id: r
            for r in semantic_decontaminate(
                vecs, bench, 0.5, kernel=kernel
            ).collect()
        }
        assert set(got) == {"a", "b", "c"}, kernel
        assert got["a"].max_cos == 1.0 and got["a"].n_hits == 1, kernel
        assert got["b"].max_cos is None and got["b"].n_hits == 0, kernel
        assert got["c"].max_cos == 0.6 and got["c"].n_hits == 1, kernel
    # empty benchmark: both kernels return an empty frame
    empty = bench.where(F.lit(False))
    for kernel in ("sql", "arrow"):
        assert (
            semantic_decontaminate(vecs, empty, 0.5, kernel=kernel).count()
            == 0
        ), kernel


def test_semantic_decontaminate_rejects_unknown_kernel(embs):
    from myasynstreamjoin_spark.functions.similarity import (
        semantic_decontaminate,
    )

    with pytest.raises(ValueError):
        semantic_decontaminate(embs, embs, kernel="nope")
