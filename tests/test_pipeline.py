"""Training-pipeline ops: hash_split (stability, completeness, salt
independence), pack_sequences (budget boundary semantics), pii_scrub
(span detection + redaction on crafted rows), embedding normalize /
quantize invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.embeddings import l2_normalize, quantize_int8
from myasynstreamjoin_spark.functions.pipeline import hash_split, pack_sequences
from myasynstreamjoin_spark.functions.text import pii_scrub


def test_hash_split_complete_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000          # every row assigned
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: the same keys land in the same split on a rerun
    again = {r["k"]: r["split"] for r in
             hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r["k"]: r["split"] for r in out.collect()}
    assert first == again


def test_hash_split_growth_stability(spark):
    """New rows must not move old keys between splits."""
    small = hash_split(spark.range(0, 500).withColumnRenamed("id", "k"),
                       "k", {"train": 0.9, "test": 0.1})
    big = hash_split(spark.range(0, 5000).withColumnRenamed("id", "k"),
                     "k", {"train": 0.9, "test": 0.1})
    s = {r["k"]: r["split"] for r in small.collect()}
    b = {r["k"]: r["split"] for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_hash_split_salt_gives_independent_fold(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in
         hash_split(df, "k", {"train": 0.5, "test": 0.5}).collect()}
    b = {r["k"]: r["split"] for r in
         hash_split(df, "k", {"train": 0.5, "test": 0.5}, salt="fold2").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert 500 < moved < 1500  # ~half move under an independent hash


def test_hash_split_validates_fractions(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "k", {"train": 0.8, "test": 0.1})


def test_pack_sequences_boundary_semantics(spark):
    """One shard, known token counts: docs are laid head-to-tail and a
    doc belongs to the sequence where it starts."""
    rows = [(i, t) for i, t in enumerate([100, 200, 300, 50, 400])]
    df = spark.createDataFrame(rows, "doc_id long, nt long")
    out = pack_sequences(df, "nt", budget=512, n_shards=1).orderBy("doc_id")
    got = [(r["seq_id"], r["seq_offset"]) for r in out.collect()]
    # prefixes: 0, 100, 300, 600, 650
    assert got == [(0, 0), (0, 100), (0, 300), (1, 88), (1, 138)]


def test_pack_sequences_shards_are_independent(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5 * 40 + 10).alias("nt")
    )
    out = pack_sequences(df, "nt", budget=256, n_shards=8)
    # offsets always inside the budget; with every doc shorter than the
    # budget, per-shard seq ids are contiguous from 0
    assert out.where((F.col("seq_offset") < 0) | (F.col("seq_offset") >= 256)).count() == 0
    per_shard = out.groupBy("shard").agg(
        F.min("seq_id").alias("lo"), F.count_distinct("seq_id").alias("n_seqs"),
        F.max("seq_id").alias("hi")).collect()
    for r in per_shard:
        assert r["lo"] == 0 and r["n_seqs"] == r["hi"] + 1


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io and d@e.org, call +1 (415) 555-0100 now"),
            (2, "server at 10.0.42.7 answered"),
            (3, "clean text, no pii here"),
            (4, "ratio 3.4.5 is not 1.2.3.4:8080 hmm"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"]) == (2, 1)
    assert "[EMAIL]" in out[1]["clean"] and "[PHONE]" in out[1]["clean"]
    assert "@" not in out[1]["clean"] and "555" not in out[1]["clean"]
    assert out[2]["n_ipv4"] == 1 and "[IP]" in out[2]["clean"]
    assert out[3]["clean"] == "clean text, no pii here"
    assert out[4]["n_ipv4"] == 1  # 1.2.3.4 matches, 3.4.5 does not


def test_l2_normalize_unit_norm(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = l2_normalize(embs).select(
        F.aggregate(F.transform("unit", lambda x: x * x),
                    F.lit(0.0), lambda a, x: a + x).alias("sq")
    )
    for r in out.collect():
        assert math.isclose(r["sq"], 1.0, abs_tol=1e-3)


def test_quantize_int8_bounds_and_roundtrip(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = quantize_int8(embs)
    mx = q.select(F.array_max(F.transform("q", F.abs)).alias("m")).agg(
        F.max("m")).first()[0]
    assert mx == 127  # symmetric scale saturates at the vector max
    # dequantized error bounded by 0.5/scale per element
    joined = q.join(embs, "vec_id").select(
        F.max(
            F.array_max(
                F.zip_with(
                    "q", "embedding",
                    lambda qi, xi: F.abs(qi / F.col("scale") - xi.cast("double")),
                )
            ) * F.col("scale")
        ).alias("worst_scaled")
    )
    assert joined.first()["worst_scaled"] <= 0.5 + 1e-6


def test_domain_mixture_rates_and_determinism(spark):
    from myasynstreamjoin_spark.functions.pipeline import domain_mixture_sample

    # big: 1000 rows, small: 40 rows. Target 50/50 of 200 total →
    # big rate 0.1, small rate 2.5 → capped at 1 (keeps all 40 rows).
    df = spark.range(0, 1040).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "big").otherwise("small").alias("source"),
    )
    out = domain_mixture_sample(
        df, "source", {"big": 0.5, "small": 0.5}, target_total=200
    )
    by_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["small"] == 40, "undersized source must keep every row (rate cap)"
    assert 60 <= by_src["big"] <= 140, f"big source ~100 expected, got {by_src['big']}"
    # deterministic: the same call yields the same survivor set
    again = domain_mixture_sample(
        df, "source", {"big": 0.5, "small": 0.5}, target_total=200
    )
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}
    # a different salt draws a different (but same-sized-ish) sample
    other = domain_mixture_sample(
        df, "source", {"big": 0.5, "small": 0.5}, target_total=200, salt="fold2"
    )
    assert {r["doc_id"] for r in out.collect()} != {r["doc_id"] for r in other.collect()}


def test_domain_mixture_drops_unweighted_sources(spark):
    from myasynstreamjoin_spark.functions.pipeline import domain_mixture_sample

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keep").otherwise("drop").alias("source"),
    )
    out = domain_mixture_sample(df, "source", {"keep": 1.0}, target_total=50)
    assert {r["source"] for r in out.select("source").distinct().collect()} == {"keep"}


def test_dedup_survivors_selection(spark):
    from myasynstreamjoin_spark.functions.cluster import dedup_survivors

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (5, 99)],
        "doc_id long, n_chars long",
    )
    # cluster A = {1,2,3} (reps: max n_chars 30, tie → min id 2);
    # cluster B = {4}; doc 5 unclustered.
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, cluster long"
    )
    got = {
        (r["doc_id"], r["is_cluster_rep"])
        for r in dedup_survivors(docs, clusters).collect()
    }
    assert got == {(2, True), (4, True), (5, False)}


def test_sample_k_per_group_cap_and_determinism(spark):
    from myasynstreamjoin_spark.functions.pipeline import sample_k_per_group

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
    )
    out = sample_k_per_group(df, "src", k=10)
    sizes = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert all(n == 10 for n in sizes.values())
    # deterministic across invocations
    again = sample_k_per_group(df, "src", k=10)
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}
    # a group smaller than k keeps everything
    small = df.where(F.col("doc_id") < 5)
    assert sample_k_per_group(small, "src", k=10).count() == 5


def test_negative_pairs_shape_and_determinism(spark):
    from myasynstreamjoin_spark.functions.pipeline import negative_pairs

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    out = negative_pairs(df, k=4, n_buckets=32)
    rows = out.collect()
    # every anchor gets k pairs except self-pair drops (rare, bounded)
    per_anchor = {r["anchor_id"]: 0 for r in rows}
    for r in rows:
        per_anchor[r["anchor_id"]] += 1
        assert r["neg_id"] != r["anchor_id"]
        assert 1 <= r["slot"] <= 4
    assert all(3 <= n <= 4 for n in per_anchor.values())
    assert len(per_anchor) == 500
    # deterministic
    again = {tuple(r) for r in negative_pairs(df, k=4, n_buckets=32).collect()}
    assert {tuple(r) for r in rows} == again
    # negatives are spread: many distinct partners used overall
    assert out.select("neg_id").distinct().count() >= 20


def test_temperature_mixture_flattens_head_domains(spark):
    from myasynstreamjoin_spark.functions.pipeline import (
        temperature_mixture_sample,
    )

    # head domain 1600 rows, tail domain 100 rows
    df = spark.range(0, 1700).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1600, "head").otherwise("tail").alias("source"),
    )

    def kept(alpha, target=400):
        out = temperature_mixture_sample(
            df, "source", alpha=alpha, target_total=target
        )
        rows = out.groupBy("source").count().collect()
        return {r["source"]: r["count"] for r in rows}

    # α=1: natural proportions — head keeps ~16x the tail's share
    natural = kept(1.0)
    # α→0: uniform target — both domains aim at ~target/2 rows
    flat = kept(0.001)
    head_share_nat = natural["head"] / (natural["head"] + natural["tail"])
    head_share_flat = flat["head"] / (flat["head"] + flat["tail"])
    assert head_share_nat > 0.85
    # uniform target: head aims at 200 rows, tail is rate-capped at its
    # full 100 — head share drops to ~2/3 from ~16/17
    assert head_share_flat < head_share_nat - 0.2
    assert flat["tail"] == 100
    # the tail domain gains absolute rows as α drops
    assert flat["tail"] > natural["tail"]
    # deterministic: same call, same survivors
    a = {r["doc_id"] for r in temperature_mixture_sample(df, "source").collect()}
    b = {r["doc_id"] for r in temperature_mixture_sample(df, "source").collect()}
    assert a == b and len(a) > 0


def test_weighted_sample_biases_toward_heavy_weights(spark):
    from myasynstreamjoin_spark.functions.pipeline import weighted_sample_k

    # 500 light rows (w=0.1) vs 500 heavy rows (w=10): heavy rows must
    # dominate the sample far beyond their 50% population share
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 0.1).otherwise(10.0).alias("w"),
    )
    got = weighted_sample_k(df, "w", k=100).collect()
    heavy = sum(1 for r in got if r.w == 10.0)
    assert len(got) == 100
    assert heavy >= 90, f"weighting too weak: {heavy}/100 heavy"
    # deterministic
    again = {r.doc_id for r in weighted_sample_k(df, "w", k=100).collect()}
    assert {r.doc_id for r in got} == again


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from myasynstreamjoin_spark.functions.pipeline import weighted_sample_k

    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 2.0), (5, float("nan"))],
        "doc_id long, w double",
    )
    got = weighted_sample_k(df, "w", k=10).collect()
    assert [r.doc_id for r in got] == [4]


def test_embedding_covariance_known_values(spark):
    from myasynstreamjoin_spark.functions.embeddings import embedding_covariance

    # dims: [x, -x, const] → var(x)=0.25 on {0,1}, cov(x,-x)=-0.25,
    # anything with the constant dim = 0
    rows = [(0, [0.0, 1.0, 2.0]), (1, [1.0, 0.0, 2.0]),
            (2, [0.0, 1.0, 2.0]), (3, [1.0, 0.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.i, r.j): r.cov for r in embedding_covariance(df).collect()}
    assert got == {
        (0, 0): 0.25, (0, 1): -0.25, (0, 2): 0.0,
        (1, 1): 0.25, (1, 2): 0.0, (2, 2): 0.0,
    }


def test_embedding_covariance_batch_invariance(spark):
    """Partial Gram matmuls reduce to the same integers regardless of
    partitioning — repartitioning must not change a single value."""
    from myasynstreamjoin_spark.functions.embeddings import embedding_covariance

    embs = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double") / 7.0,
            (F.col("id") % 3).cast("double") / 3.0,
            F.lit(0.5),
        ).alias("embedding"),
    )
    a = {(r.i, r.j): r.cov for r in embedding_covariance(embs).collect()}
    b = {(r.i, r.j): r.cov
         for r in embedding_covariance(embs.repartition(13)).collect()}
    assert a == b


def test_pca_invariants(spark, sf_dir):
    """Orthonormal components, descending eigenvalues, projected
    variance ≈ eigenvalue, full-rank projection preserves centered
    norms (rotation), and partition invariance."""
    import numpy as np

    from myasynstreamjoin_spark.functions.embeddings import pca_project

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    proj, w, vals = pca_project(embs, k=8)
    assert w.shape[0] == 8
    assert np.allclose(w @ w.T, np.eye(8), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(7))
    p = np.stack([r.proj for r in proj.collect()])
    var = p.var(axis=0)
    assert np.allclose(var, vals, rtol=0.01, atol=1e-6)

    # full-rank: rotation preserves centered norms
    d = w.shape[1]
    full, wf, _ = pca_project(embs, k=d)
    x = np.stack([r.embedding for r in embs.orderBy("vec_id").collect()]).astype(
        "float64"
    )
    xc = x - x.mean(axis=0)
    pf = np.stack([r.proj for r in full.orderBy("vec_id").collect()])
    assert np.allclose(
        np.linalg.norm(pf, axis=1), np.linalg.norm(xc, axis=1), atol=1e-4
    )

    # repartitioning must not change a single projected value
    proj2, _, _ = pca_project(embs.repartition(7), k=8)
    a = {r.vec_id: tuple(r.proj) for r in proj.collect()}
    b = {r.vec_id: tuple(r.proj) for r in proj2.collect()}
    assert a == b


def test_span_corruption_invariants(spark):
    """Masked input + targets reconstruct the document: sentinels
    align, spans are span_len tokens, non-overlapping, and splicing
    targets back into the input reproduces the original text."""
    from myasynstreamjoin_spark.functions.pipeline import span_corruption_pairs

    text = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, text), (2, "short doc")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in span_corruption_pairs(docs).collect()}
    # short doc passes through unmasked
    assert out[2].input_text == "short doc" and out[2].target_text is None
    r = out[1]
    # reconstruct: replace each sentinel in input with its target span
    tgt = r.target_text.split()
    spans, cur = {}, None
    for tok in tgt:
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    assert all(len(v) == 5 for v in spans.values())
    rebuilt = []
    for tok in r.input_text.split():
        rebuilt.extend(spans[tok] if tok in spans else [tok])
    assert " ".join(rebuilt) == text


def test_plan_data_budget_invariants(spark):
    """Σ alloc == min(budget, Σ cap); 0 ≤ alloc ≤ cap; small domains
    saturate before large ones; all-capped when budget exceeds caps."""
    from myasynstreamjoin_spark.functions.pipeline import plan_data_budget

    rows = []
    sizes = {"tiny": 10, "small": 100, "mid": 500, "big": 2000}
    did = 0
    for src, n in sizes.items():
        # one doc of n tokens per domain
        rows.append((did, " ".join(["w"] * n), src))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    out = {r.source: r for r in plan_data_budget(docs, 3000, 3).collect()}
    assert sum(r.alloc for r in out.values()) == 3000
    for src, n in sizes.items():
        assert 0 <= out[src].alloc <= 3 * n
    # tiny and small saturate; big does not
    assert out["tiny"].alloc == 30 and out["small"].alloc == 300
    assert out["big"].alloc < 6000

    # budget above total caps: everything saturates, surplus unspent
    out2 = {r.source: r for r in plan_data_budget(docs, 10**9, 3).collect()}
    assert all(out2[s].alloc == 3 * n for s, n in sizes.items())


def test_dataset_card_rolls_up_components(spark, sf_dir):
    """Card rows must agree with the component operators aggregated by
    hand (quality/entropy via micro-unit sums, dup_frac as a ratio of
    span sums), and every source of the corpus appears."""
    from collections import defaultdict

    from myasynstreamjoin_spark.functions.dedup import dup_span_stats
    from myasynstreamjoin_spark.functions.pipeline import dataset_card
    from myasynstreamjoin_spark.functions.text import quality_score
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    card = {r["source"]: r for r in dataset_card(docs).collect()}
    assert set(card) == {
        r["source"] for r in docs.select("source").distinct().collect()
    }
    src_of = {r["doc_id"]: r["source"] for r in docs.collect()}
    q_sum, n = defaultdict(int), defaultdict(int)
    for r in quality_score(docs).collect():
        q_sum[src_of[r["doc_id"]]] += round(r["quality"] * 1e6)
        n[src_of[r["doc_id"]]] += 1
    d_sum, s_sum = defaultdict(int), defaultdict(int)
    for r in dup_span_stats(docs).collect():
        d_sum[src_of[r["doc_id"]]] += r["n_dup_spans"]
        s_sum[src_of[r["doc_id"]]] += r["n_spans"]
    for src, row in card.items():
        assert row["n_docs"] == n[src]
        assert 0.0 <= row["avg_quality"] <= 1.0
        assert row["avg_quality"] == q_sum[src] / (n[src] * 1e6)
        assert row["dup_frac"] == d_sum[src] / s_sum[src]
        assert row["n_en"] <= row["n_docs"]


def test_epoch_shuffle_is_a_seeded_permutation(spark, sf_dir):
    """Different seeds reshuffle (rows move shards AND reorder within
    shards) while conserving the corpus; the same seed is bit-stable."""
    from myasynstreamjoin_spark.functions.pipeline import (
        epoch_shuffle,
        epoch_shuffle_manifest,
    )
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    m0 = {r["shard"]: r for r in epoch_shuffle_manifest(docs, seed=0).collect()}
    m1 = {r["shard"]: r for r in epoch_shuffle_manifest(docs, seed=1).collect()}
    # conservation: a reshuffle loses nothing
    assert sum(r["n_docs"] for r in m0.values()) == docs.count()
    assert sum(r["n_docs"] for r in m0.values()) == sum(
        r["n_docs"] for r in m1.values()
    )
    assert sum(r["sum_weight"] for r in m0.values()) == sum(
        r["sum_weight"] for r in m1.values()
    )
    # a fresh epoch is a different permutation
    assert any(
        m0[s]["order_checksum"] != m1[s]["order_checksum"] for s in m0
    )
    # docs move across shards between epochs
    a = {r["doc_id"]: r["shard"] for r in
         epoch_shuffle(docs, seed=0).select("doc_id", "shard").collect()}
    b = {r["doc_id"]: r["shard"] for r in
         epoch_shuffle(docs, seed=1).select("doc_id", "shard").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > len(a) // 2  # ~15/16 move under an independent hash
    # same seed → identical manifest (deterministic across reruns)
    again = {r["shard"]: r for r in
             epoch_shuffle_manifest(docs, seed=0).collect()}
    for s, row in m0.items():
        assert row == again[s]


def test_epoch_shuffle_checksum_is_order_sensitive(spark):
    """Swapping two rows within a shard must change order_checksum —
    the property shard_manifest's order-free checksum lacks."""
    from myasynstreamjoin_spark.functions.pipeline import epoch_shuffle

    docs = spark.createDataFrame(
        [(i, 10) for i in range(64)], "doc_id long, n_chars long"
    )
    out = epoch_shuffle(docs, seed=0, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    # ranks are 1..n dense per shard, ordered by digest
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["shard_rank"])
        assert [r["shard_rank"] for r in rows] == list(range(1, len(rows) + 1))
        digests = [r["shuffle_key"] for r in rows]
        assert digests == sorted(digests)
    # checksum under the true order differs from any transposition
    rows = max(by_shard.values(), key=len)
    true_sum = sum(r["shard_rank"] * (r["doc_id"] % 1_000_003) for r in rows)
    swapped = [r["doc_id"] for r in rows]
    swapped[0], swapped[1] = swapped[1], swapped[0]
    swap_sum = sum(
        (i + 1) * (d % 1_000_003) for i, d in enumerate(swapped)
    )
    assert true_sum != swap_sum


def test_epoch_interleave_stride_proportionality(spark):
    """The stride invariant: in EVERY prefix of a shard's read order,
    each source's count tracks its weight share within a bounded
    error — not just in expectation over the whole epoch."""
    from myasynstreamjoin_spark.functions.pipeline import epoch_interleave

    rows = [(i, "heavy" if i % 4 != 3 else "light") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    weight = F.when(F.col("source") == "heavy", F.lit(3)).otherwise(F.lit(1))
    out = (
        epoch_interleave(docs, weight, seed=0, n_shards=1)
        .select("source", "interleave_rank")
        .collect()
    )
    order = [r["source"] for r in sorted(out, key=lambda r: r["interleave_rank"])]
    assert len(order) == 400
    # stride emission RATES follow per-source weights (3:1), and the
    # corpus is built 300 heavy / 100 light so both sources exhaust at
    # the same virtual time — every prefix should be ~3/4 heavy
    assert order.count("heavy") == 300
    seen_h = 0
    for t, src in enumerate(order, start=1):
        seen_h += src == "heavy"
        expect = t * 3 / 4
        # stride scheduling bounds per-source drift to ~1 quantum;
        # allow 3 for digest tie-breaks at equal virtual times
        assert abs(seen_h - expect) <= 3, (t, seen_h, expect)


def test_epoch_interleave_without_replacement_and_deterministic(spark, sf_dir):
    from myasynstreamjoin_spark.functions.pipeline import (
        epoch_interleave_manifest,
    )
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = F.expr("CAST(substring(source, 4) AS INT) % 4 + 1")
    m = {r["shard"]: r for r in
         epoch_interleave_manifest(docs, w, seed=1).collect()}
    assert sum(r["n_docs"] for r in m.values()) == docs.count()
    again = {r["shard"]: r for r in
             epoch_interleave_manifest(docs, w, seed=1).collect()}
    assert m == again


def test_epoch_interleave_exhaustion_hands_over_to_remaining_sources(spark):
    """When a source exhausts mid-epoch (weight outpaces its size),
    the rest of the read order must be the remaining sources alone —
    nothing is re-emitted, nothing is starved."""
    from myasynstreamjoin_spark.functions.pipeline import epoch_interleave

    rows = [(i, "heavy") for i in range(30)] + [
        (100 + i, "light") for i in range(90)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    weight = F.when(F.col("source") == "heavy", F.lit(3)).otherwise(F.lit(1))
    out = epoch_interleave(docs, weight, seed=0, n_shards=1).collect()
    order = [r["source"] for r in sorted(out, key=lambda r: r["interleave_rank"])]
    assert len(order) == 120 and order.count("heavy") == 30
    # heavy (rate 3) exhausts its 30 docs by virtual time 10*SCALE,
    # when light (rate 1) has emitted ~10 — all heavy docs live in the
    # first ~40 reads (± a tie quantum), the tail is pure light
    assert order[:43].count("heavy") == 30
    assert all(s == "light" for s in order[45:])


def test_quota_sample_exact_budget_and_proportionality(spark, sf_dir):
    """Largest-remainder apportionment: Σ quotas == total EXACTLY,
    every group within one doc of proportional, deterministic draw."""
    from myasynstreamjoin_spark.functions.pipeline import quota_sample
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 7 != 0
    )
    total = 97
    out = quota_sample(docs, total).collect()
    assert len(out) == total
    per: dict[str, int] = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    cnt = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n = sum(cnt.values())
    # reference Hamilton apportionment
    base = {s: total * c // n for s, c in cnt.items()}
    rem = sorted(
        ((total * c) % n, s) for s, c in cnt.items()
    )
    for _, s in sorted(rem, key=lambda t: (-t[0], t[1]))[
        : total - sum(base.values())
    ]:
        base[s] += 1
    assert per == base
    # proportionality: each group's share within one of exact
    for s, q in per.items():
        assert abs(q - total * cnt[s] / n) < 1
    # determinism
    again = {
        (r["doc_id"], r["source"])
        for r in quota_sample(docs, total).collect()
    }
    assert again == {(r["doc_id"], r["source"]) for r in out}


def test_select_to_budget_greedy_cut_invariants(spark, sf_dir):
    """Per domain: selection stops at the first doc whose PRE-sum
    reaches the effective allocation (so tokens_sel overshoots eff by
    less than the boundary doc), never exceeds the domain's own corpus,
    and prefers higher-quality docs (every selected doc's quality ≥
    every unselected doc's quality, up to the doc_id tie-break)."""
    from pyspark.sql import functions as F

    from myasynstreamjoin_spark.functions.pipeline import (
        plan_data_budget,
        select_to_budget,
    )
    from myasynstreamjoin_spark.functions.text import quality_score, tokens
    from myasynstreamjoin_spark.sources import tables

    docs = tables.load_table(spark, sf_dir, "documents")
    budget, rep = 7_500, 3
    out = {
        r["source"]: r
        for r in select_to_budget(docs, budget, rep).collect()
    }
    plan = {
        r["source"]: min(r["alloc"], r["n_tokens"])
        for r in plan_data_budget(docs, budget, rep).collect()
    }
    per_doc = (
        docs.where(F.col("text").isNotNull())
        .select(
            "doc_id", "source",
            F.size(tokens("text")).cast("long").alias("toks"),
        )
        .join(quality_score(docs), "doc_id")
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in per_doc:
        by_src.setdefault(r["source"], []).append(r)
    for src, eff in plan.items():
        rows = sorted(
            by_src[src], key=lambda r: (-r["quality"], r["doc_id"])
        )
        # replay the greedy cut
        sel, cum = [], 0
        for r in rows:
            if cum < eff:
                sel.append(r)
                cum += r["toks"]
        got = out.get(src)
        if not sel:
            assert got is None
            continue
        assert got["n_docs_sel"] == len(sel)
        assert got["tokens_sel"] == cum
        assert got["sel_id_sum"] == sum(r["doc_id"] for r in sel)
        # overshoot strictly less than the boundary doc's own tokens
        assert cum - eff < sel[-1]["toks"]
        assert cum <= sum(r["toks"] for r in rows)


def test_augment_matches_hashlib_model(spark):
    """The augmented variant must equal a plain-Python replay of the
    md5-draw semantics token-for-token, and changing the salt draws a
    different (still deterministic) variant."""
    import hashlib
    import re

    from myasynstreamjoin_spark.functions.pipeline import augment_docs

    def draw(doc_id, pos, role, salt):
        h = hashlib.md5(f"{doc_id}:{pos}:{role}:{salt}".encode()).hexdigest()
        return int(h[:8], 16) % 100

    def model(doc_id, text, ps, pd, salt):
        toks = re.split(r"\s+", text.strip().lower())
        n = len(toks)
        sw, n_sw = [], 0
        for i in range(1, n + 1):
            if i % 2 == 1 and i < n and draw(doc_id, i, "swap", salt) < ps:
                sw.append(toks[i])  # partner (i+1, 0-based i)
            elif i % 2 == 0 and draw(doc_id, i - 1, "swap", salt) < ps:
                sw.append(toks[i - 2])
            else:
                sw.append(toks[i - 1])
        for i in range(1, n + 1):
            if i % 2 == 1 and i < n and draw(doc_id, i, "swap", salt) < ps:
                n_sw += 1
        kept = [
            sw[i - 1]
            for i in range(1, n + 1)
            if draw(doc_id, i, "del", salt) >= pd
        ]
        return (n, n_sw, n - len(kept), " ".join(kept))

    rows = [(i, f"w{j} " * (5 + i % 7) + "end") for i, j in enumerate(range(9))]
    docs = spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_swapped_pairs"], r["n_deleted"], r["text_aug"]
        )
        for r in augment_docs(docs, 30, 25).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == model(doc_id, text, 30, 25, "aug"), doc_id
    # independent variant under a different salt
    other = {
        r["doc_id"]: r["text_aug"]
        for r in augment_docs(docs, 30, 25, salt="aug2").collect()
    }
    assert any(other[d] != got[d][3] for d, _ in rows)
    # and augmentation is map-only
    plan = (
        augment_docs(docs, 30, 25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
