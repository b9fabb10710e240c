"""Composed ingest admission gate (functions/ingest.py::ingest_gate).

The composition is the contract: first matching gate wins (blocked →
dup_exact → dup_within → dup_near → admitted), so a blocked document
must never count as a duplicate and an exact dup must never reach the
near-dup probe. Crafted docs hit every status and every priority
collision.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.dedup import (
    write_fingerprint_index,
    write_minhash_index,
)
from myasynstreamjoin_spark.functions.ingest import ingest_gate, ingest_summary

FP, MH = "test_ingest_fp", "test_ingest_mh"

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog every day", "web"),
    (2, "spark shuffles data between executors during wide stages", "web"),
]
# near-dup of doc 2: one word changed
NEARDUP = "spark shuffles data between executors during wide phases"

DELTA = [
    (11, "completely fresh content about nothing in particular", "web"),
    (13, "the quick brown fox jumps over the lazy dog every day", "web"),   # dup_exact
    (15, NEARDUP, "web"),                                                   # dup_near
    (17, "another fresh document with its own words", "book"),
    (19, "another fresh document with its own words", "book"),              # dup_within of 17
    (21, "bad bad bad bad bad content here", "book"),                       # blocked
    # blocked AND exact dup of corpus doc 0 -> blocked wins
    (23, "bad bad bad bad bad " + CORPUS[0][1], "web"),
]


@pytest.fixture(scope="module")
def gate_tables(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string, source string")
    tmp = tempfile.mkdtemp(prefix="ingest_gate_")
    write_fingerprint_index(docs, FP, n_buckets=4, path=os.path.join(tmp, "fp"))
    write_minhash_index(docs, MH, n_buckets=4, path=os.path.join(tmp, "mh"))
    yield
    for t in (FP, MH, f"{MH}_sh"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_every_status_and_priority(spark, gate_tables):
    delta = spark.createDataFrame(DELTA, "doc_id long, text string, source string")
    gated = ingest_gate(
        delta, FP, MH, terms=["bad"], max_hits=4, neardup_threshold=0.5
    )
    got = {r["doc_id"]: r["status"] for r in gated.collect()}
    assert got == {
        11: "admitted",
        13: "dup_exact",
        15: "dup_near",
        17: "admitted",
        19: "dup_within",
        21: "blocked",
        23: "blocked",  # blocklist outranks the exact-dup match
    }


def test_summary_checksums(spark, gate_tables):
    delta = spark.createDataFrame(DELTA, "doc_id long, text string, source string")
    gated = ingest_gate(
        delta, FP, MH, terms=["bad"], max_hits=4, neardup_threshold=0.5
    )
    summ = {
        r["source"]: (r["n_in"], r["n_blocked"], r["n_dup_exact"],
                      r["n_dup_within"], r["n_dup_near"], r["n_admitted"],
                      r["admitted_id_sum"])
        for r in ingest_summary(gated).collect()
    }
    assert summ == {
        "web": (4, 1, 1, 0, 1, 1, 11),
        "book": (3, 1, 0, 1, 0, 1, 17),
    }
