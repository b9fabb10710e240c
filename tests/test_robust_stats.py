"""Semantic tests for the round-6 closing analytics ops: soft-dedup
weights, chi²/Cramér's-V association, exact winsorization, mergeable
HLL distinct sketches, and the curriculum epoch schedule. Each is
checked against a brute-force pure-Python model on a frame small
enough to verify by hand — the oracle-parity mirror covers the
registry wrappers separately."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F


# ---------------------------------------------------------------- soft dedup

def test_soft_dedup_weight_is_exact_ppm_of_cluster_size(spark):
    from myasynstreamjoin_spark.functions.dedup import soft_dedup_weights

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta", source="a", n_chars=10),
            Row(doc_id=2, text="Alpha   beta ", source="b", n_chars=13),  # dup of 1
            Row(doc_id=3, text="alpha beta", source="c", n_chars=10),    # dup of 1
            Row(doc_id=4, text="unique text", source="a", n_chars=11),
        ]
    )
    got = {r["doc_id"]: r for r in soft_dedup_weights(docs).collect()}
    assert got[1]["n_copies"] == 3 and got[1]["weight_ppm"] == 1_000_000 // 3
    assert got[2]["weight_ppm"] == got[3]["weight_ppm"] == 333_333
    assert got[4]["n_copies"] == 1 and got[4]["weight_ppm"] == 1_000_000
    # soft dedup never drops rows
    assert soft_dedup_weights(docs).count() == 4


def test_soft_dedup_summary_no_dups_is_identity(spark, sf_dir):
    from myasynstreamjoin_spark.functions.dedup import soft_dedup_summary

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for r in soft_dedup_summary(docs).collect():
        # the synthetic corpus has no exact duplicates: effective mass
        # must equal raw mass exactly
        assert r["eff_docs_ppm"] == r["n_docs"] * 1_000_000
        assert r["eff_chars_ppm"] == r["n_chars"] * 1_000_000


def test_soft_dedup_summary_discounts_cross_source_copies(spark):
    from myasynstreamjoin_spark.functions.dedup import soft_dedup_summary

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="same text", source="a", n_chars=9),
            Row(doc_id=2, text="same text", source="b", n_chars=9),
            Row(doc_id=3, text="other", source="a", n_chars=5),
        ]
    )
    got = {r["source"]: r for r in soft_dedup_summary(docs).collect()}
    # each copy of the cross-source pair carries half weight
    assert got["a"]["eff_docs_ppm"] == 500_000 + 1_000_000
    assert got["b"]["eff_docs_ppm"] == 500_000
    assert got["a"]["eff_chars_ppm"] == 9 * 500_000 + 5 * 1_000_000
    # hard dedup would have attributed the surviving copy entirely to
    # one source; soft dedup splits the mass — totals still conserve
    assert got["a"]["n_docs"] == 2 and got["b"]["n_docs"] == 1


# ------------------------------------------------------------- association

def test_association_independent_columns_score_zero(spark):
    from myasynstreamjoin_spark.operators.stats import categorical_association

    # perfectly proportional 2×2 grid: o == e in every cell
    rows = []
    i = 0
    for a, b, n in [("x", "p", 20), ("x", "q", 10), ("y", "p", 40), ("y", "q", 20)]:
        for _ in range(n):
            rows.append(Row(id=i, a=a, b=b))
            i += 1
    r = categorical_association(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert r["n"] == 90 and r["dof"] == 1
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_association_identical_columns_score_one(spark):
    from myasynstreamjoin_spark.operators.stats import categorical_association

    rows = [Row(id=i, a=f"c{i % 3}", b=f"c{i % 3}") for i in range(300)]
    r = categorical_association(spark.createDataFrame(rows), "a", "b").collect()[0]
    # perfect association: chi2 = n·(k−1), Cramér's V = 1 (up to the
    # micro-unit truncation of the integer fold)
    assert abs(r["chi2"] - 300 * 2) < 1e-3
    assert abs(r["cramers_v"] - 1.0) < 1e-5


def test_association_matches_textbook_chi2(spark):
    from myasynstreamjoin_spark.operators.stats import categorical_association

    # small contingency table checked against the direct formula
    counts = {("x", "p"): 12, ("x", "q"): 5, ("y", "p"): 7, ("y", "q"): 9}
    rows = []
    i = 0
    for (a, b), n in counts.items():
        for _ in range(n):
            rows.append(Row(id=i, a=a, b=b))
            i += 1
    n = sum(counts.values())
    ra = {"x": 17, "y": 16}
    cb = {"p": 19, "q": 14}
    chi2 = sum(
        (o - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for (a, b), o in counts.items()
    )
    r = categorical_association(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert abs(r["chi2"] - chi2) < 1e-5
    assert abs(r["cramers_v"] - math.sqrt(chi2 / n)) < 1e-6


def test_association_single_category_is_null_not_inf(spark):
    from myasynstreamjoin_spark.operators.stats import categorical_association

    rows = [Row(id=i, a="only", b=f"b{i % 4}") for i in range(40)]
    r = categorical_association(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert r["dof"] == 0 and r["chi2"] == 0.0 and r["cramers_v"] is None


# ------------------------------------------------------------- winsorization

def _brute_winsor(vals, lo_pct, hi_pct):
    s = sorted(vals)
    n = len(s)
    k_lo = max(1, (n * lo_pct) // 100)
    k_hi = min(n, (n * hi_pct + 99) // 100)
    cut_lo, cut_hi = s[k_lo - 1], s[k_hi - 1]
    wins = [min(cut_hi, max(cut_lo, v)) for v in vals]
    return {
        "n": n,
        "cut_lo": cut_lo,
        "cut_hi": cut_hi,
        "sum_raw": sum(vals),
        "sum_wins": sum(wins),
        "n_clamped_lo": sum(1 for v in vals if v < cut_lo),
        "n_clamped_hi": sum(1 for v in vals if v > cut_hi),
    }


def test_winsorized_stats_matches_brute_force(spark):
    from myasynstreamjoin_spark.operators.stats import winsorized_stats

    import random

    rng = random.Random(7)
    data = [
        Row(event_id=i, event_type=f"g{i % 3}", value=float(rng.randrange(-500, 5000)))
        for i in range(200)
    ]
    # plant wild outliers that winsorization must tame
    data += [
        Row(event_id=1000 + j, event_type="g0", value=1e6 + j) for j in range(3)
    ]
    df = spark.createDataFrame(data)
    got = {r["key"]: r for r in winsorized_stats(df, "event_type", "value").collect()}
    by_group: dict[str, list[int]] = {}
    for r in data:
        by_group.setdefault(r.event_type, []).append(round(r.value * 1000))
    for g, vals in by_group.items():
        want = _brute_winsor(vals, 5, 95)
        for k, v in want.items():
            assert got[g][k] == v, (g, k, got[g][k], v)
    # the planted 1e9-unit outliers must not survive into sum_wins
    assert got["g0"]["sum_wins"] < 1_000_000_000


def test_winsorized_stats_constant_group_never_clamps(spark):
    from myasynstreamjoin_spark.operators.stats import winsorized_stats

    df = spark.createDataFrame(
        [Row(event_id=i, event_type="k", value=42.0) for i in range(10)]
    )
    r = winsorized_stats(df, "event_type", "value").collect()[0]
    assert r["cut_lo"] == r["cut_hi"] == 42_000
    assert r["sum_wins"] == r["sum_raw"] == 420_000
    assert r["n_clamped_lo"] == r["n_clamped_hi"] == 0


# ------------------------------------------------------------ HLL sketches

def test_sketch_merge_equals_single_pass_estimate(spark, sf_dir):
    from myasynstreamjoin_spark.operators.stats import (
        distinct_sketch_rollup,
        distinct_sketch_shards,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    merged = {
        r["grp"]: r["est_merged"]
        for r in distinct_sketch_rollup(
            distinct_sketch_shards(events, "event_type", "user_id")
        ).collect()
    }
    # one sketch over the whole group, no sharding: the union of the
    # per-shard sketches must give the IDENTICAL estimate (HLL merge
    # is lossless at equal lg_k — that is what makes the per-shard
    # artifact trustworthy for late rollups)
    single = {
        r["grp"]: r["est"]
        for r in events.groupBy(F.col("event_type").alias("grp"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
            )
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    assert merged == single


def test_sketch_rollup_audit_within_tolerance(spark, sf_dir):
    from myasynstreamjoin_spark.operators.stats import (
        distinct_sketch_rollup,
        distinct_sketch_shards,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = events.groupBy(F.col("event_type").alias("grp")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    sk = distinct_sketch_shards(events, "event_type", "user_id")
    # the sketch artifact itself is a binary column — the storable form
    assert dict(sk.dtypes)["sketch"] == "binary"
    for r in distinct_sketch_rollup(sk, exact).collect():
        assert r["approx_ok"], (r["grp"], r["est_merged"], r["n_exact"])


# -------------------------------------------------------------- curriculum

def test_curriculum_stages_are_contiguous_and_tile_each_shard(spark, sf_dir):
    from myasynstreamjoin_spark.functions.pipeline import (
        epoch_curriculum,
        epoch_curriculum_manifest,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stage = F.expr("n_chars DIV 40")
    man = epoch_curriculum_manifest(docs, stage, seed=1, n_shards=8).collect()
    by_shard: dict[int, list] = {}
    for r in man:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["stage"])
        # stage blocks tile [1, n_docs] with no gap or overlap
        assert rows[0]["rank_from"] == 1
        for prev, cur in zip(rows, rows[1:]):
            assert cur["rank_from"] == prev["rank_to"] + 1
            assert prev["stage"] < cur["stage"]
        assert rows[-1]["rank_to"] == sum(r["n_docs"] for r in rows)

    # membership is the epoch shuffle's: the stage key only reorders
    cur = epoch_curriculum(docs, stage, seed=1, n_shards=8)
    from myasynstreamjoin_spark.functions.pipeline import epoch_shuffle

    base = epoch_shuffle(docs, seed=1, n_shards=8)
    assert (
        cur.select("doc_id", "shard").exceptAll(
            base.select("doc_id", "shard")
        ).count()
        == 0
    )


def test_anti_curriculum_reverses_stage_order(spark, sf_dir):
    from myasynstreamjoin_spark.functions.pipeline import epoch_curriculum

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    stage = F.expr("n_chars DIV 40")
    first_easy = (
        epoch_curriculum(docs, stage, seed=0, n_shards=1)
        .where(F.col("curriculum_rank") == 1)
        .collect()[0]
    )
    first_hard = (
        epoch_curriculum(docs, -stage, seed=0, n_shards=1)
        .where(F.col("curriculum_rank") == 1)
        .collect()[0]
    )
    # the anti-curriculum starts at the hardest stage
    assert first_easy["stage"] == -(-first_easy["stage"])
    assert first_hard["stage"] <= -first_easy["stage"]
    assert first_easy["stage"] <= -first_hard["stage"]


# ---------------------------------------------------------- retrieval eval

def test_retrieval_metrics_match_brute_force(spark, sf_dir):
    import math

    import numpy as np

    from myasynstreamjoin_spark.functions.similarity import (
        ndcg_discounts_ppm,
        retrieval_metrics,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = embs.select("vec_id", "embedding", "label").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    labs = {r["vec_id"]: r["label"] for r in rows}
    qids, k = [0, 1, 2, 3], 10
    d = ndcg_discounts_ppm(k)
    prefix = [sum(d[: i + 1]) for i in range(k)]

    got = {
        r["query_id"]: r
        for r in retrieval_metrics(embs, qids, k=k).collect()
    }
    from collections import Counter

    lc = Counter(labs.values())
    for q in qids:
        qv = vecs[q]
        scored = sorted(
            (
                (-round(float(vecs[i] @ qv
                              / (np.linalg.norm(vecs[i]) * np.linalg.norm(qv))), 4), i)
                for i in vecs
                if i != q
            ),
        )[:k]
        rel = [1 if labs[i] == labs[q] else 0 for _, i in scored]
        hits = sum(rel)
        dcg = sum(r * d[j] for j, r in enumerate(rel))
        n_rel = lc[labs[q]] - 1
        idcg = prefix[max(1, min(k, n_rel)) - 1]
        ndcg = (dcg * 1_000_000) // idcg if n_rel >= 1 else 0
        first = next((j + 1 for j, r in enumerate(rel) if r), None)
        g = got[q]
        assert g["n_rel_corpus"] == n_rel
        assert g["hits_at_k"] == hits
        assert g["dcg_ppm"] == dcg
        assert g["ndcg_ppm"] == ndcg
        assert g["mrr_ppm"] == (1_000_000 // first if first else 0)
        assert g["p_at_k_ppm"] == hits * 1_000_000 // k


def test_ndcg_discounts_are_the_metric_constants():
    import math

    from myasynstreamjoin_spark.functions.similarity import ndcg_discounts_ppm

    d = ndcg_discounts_ppm(10)
    assert d[0] == 1_000_000  # 1/log2(2)
    assert len(d) == 10 and all(a > b for a, b in zip(d, d[1:]))
    assert d[9] == round(1_000_000 / math.log2(11))


# ------------------------------------------------------- compression ratio

def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    import zlib

    from myasynstreamjoin_spark.functions.text import compression_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        raw = r["text"].encode("utf-8")
        nc = len(zlib.compress(raw, 6))
        g = got[r["doc_id"]]
        assert g["n_bytes"] == len(raw)
        assert g["n_compressed"] == nc
        assert g["ratio_milli"] == (nc * 1000) // len(raw)


def test_compression_gate_drops_boilerplate_and_random(spark, sf_dir):
    import random

    from pyspark.sql import Row

    from myasynstreamjoin_spark.functions.text import compression_gate

    rng = random.Random(3)
    # a real corpus document as the natural-text sample (the gate's
    # default band is calibrated to the corpus: ~390–1120 milli)
    natural = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") == 0)
        .collect()[0]["text"]
    )
    boiler = "menu item click here " * 200          # templated repetition
    junk = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(800))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=natural),
            Row(doc_id=2, text=boiler),
            Row(doc_id=3, text=junk),
        ]
    )
    # explicit band for the fixture: natural doc 0 sits at 703 milli,
    # the boilerplate at 12, the printable-ASCII junk at 865
    kept = {
        r["doc_id"]
        for r in compression_gate(docs, lo_milli=300, hi_milli=800).collect()
    }
    assert kept == {1}


# --------------------------------------------------------- hard negatives

def test_hard_negatives_match_brute_force(spark, sf_dir):
    import numpy as np

    from myasynstreamjoin_spark.functions.similarity import hard_negatives

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = embs.select("vec_id", "embedding", "label").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in rows}
    labs = {r["vec_id"]: r["label"] for r in rows}
    qids, k = [0, 1], 5

    got = hard_negatives(embs, qids, k=k).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)

    for q in qids:
        qv = vecs[q]
        cand = sorted(
            (
                -round(float(vecs[i] @ qv
                             / (np.linalg.norm(vecs[i]) * np.linalg.norm(qv))), 4),
                i,
            )
            for i in vecs
            if i != q and labs[i] != labs[q]
        )[:k]
        want = [(i, -c) for c, i in cand]
        have = [(r["vec_id"], r["cos"]) for r in by_q[q]]
        assert have == want
        # every mined negative really is a different label
        assert all(r["neg_label"] != labs[q] for r in by_q[q])
        assert [r["rank"] for r in by_q[q]] == list(range(1, k + 1))
