"""Winnowing fingerprints (functions/dedup.py::winnow_fingerprints):
the MOSS selection rule's structural guarantees on synthetic docs, plus
the pair join's candidate semantics. Oracle parity at the corpus level
is covered by test_oracle_parity (q_winnow_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.dedup import (
    md5_32,
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 4, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fingerprints_subset_of_gram_hashes(spark):
    """Every selected fingerprint is the hash of some k-gram of the doc."""
    text = "a b c d e f g h i j k l m n"
    docs = _docs(spark, [(1, text)])
    fps = {r.fp for r in winnow_fingerprints(docs, K, W).collect()}
    toks = text.split()
    grams = spark.range(1).select(*[
        md5_32(F.lit(" ".join(toks[i:i + K]))).alias(f"g{i}")
        for i in range(len(toks) - K + 1)
    ]).collect()[0]
    assert fps <= set(grams)
    assert fps  # at least one window minimum selected


def test_shared_run_guarantee(spark):
    """Two docs sharing a token run of length ≥ w + k − 1 share at
    least one fingerprint — the winnowing detection guarantee."""
    shared = "q w e r t y u"  # 7 tokens = w + k - 1
    docs = _docs(spark, [
        (1, "alpha beta gamma " + shared + " delta"),
        (2, "one two " + shared + " three four five"),
    ])
    fp = winnow_fingerprints(docs, K, W)
    both = (
        fp.groupBy("fp").agg(F.countDistinct("doc_id").alias("n"))
        .where(F.col("n") == 2).count()
    )
    assert both >= 1


def test_short_doc_single_fingerprint(spark):
    """Docs shorter than k tokens fingerprint their whole text."""
    docs = _docs(spark, [(1, "tiny doc")])
    rows = winnow_fingerprints(docs, K, W).collect()
    assert len(rows) == 1
    expected = spark.range(1).select(md5_32(F.lit("tiny doc")).alias("h")).collect()[0].h
    assert rows[0].fp == expected


def test_pairs_require_min_common(spark):
    """Identical docs pair up; unrelated docs don't."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [
        (1, text),
        (2, text),
        (3, "completely different words about spark query planning"),
    ])
    pairs = winnow_pairs(docs, K, W, min_common=2).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


def test_prefix_jaccard_exactness_tiny(spark):
    """Prefix-filtered join equals brute force on a hand-built corpus
    with duplicate, near-dup, and disjoint docs (incl. single-token)."""
    from itertools import combinations

    from myasynstreamjoin_spark.functions.dedup import prefix_jaccard_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (4, "mu nu xi omicron pi"),
        (5, "single"),
        (6, "single"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_jaccard_pairs(docs, 0.8, shingle_k=None).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    brute = {
        (a, b)
        for a, b in combinations(sorted(sets), 2)
        if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= 0.8
    }
    assert got == brute == {(1, 2), (1, 3), (2, 3), (5, 6)}


def test_simhash_pairs_lossless_vs_bruteforce(spark, sf_dir):
    """Banded pigeonhole join == brute-force Hamming≤1 over all
    signature pairs (the losslessness guarantee, checked exhaustively
    on the fixture corpus)."""
    from myasynstreamjoin_spark.functions.dedup import simhash, simhash_pairs
    from myasynstreamjoin_spark.sources import tables

    docs = tables.load_table(spark, sf_dir, "documents")
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 1
    }
    got = {(r.doc_a, r.doc_b) for r in simhash_pairs(docs).collect()}
    assert got == brute
