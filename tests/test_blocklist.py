"""Blocklist term scanning (functions/text.py::blocklist_hits).

Semantics contract: non-overlapping leftmost substring counts over the
normalized text — exactly Python's ``str.count`` and exactly SQL's
replace-length identity — so the JVM expression kernel, the
Aho-Corasick Arrow kernel, and the DuckDB oracle must agree to the
integer on any input, including self-overlapping terms ("aa" in
"aaaa" is 2, not 3) and terms nested in each other ("he" inside
"she").
"""

from __future__ import annotations

from myasynstreamjoin_spark.functions.text import (
    blocklist_filter,
    blocklist_hits,
    blocklist_summary,
    normalized,
)

TERMS = ["he", "she", "his", "aa", "scan fast"]


def _model(docs_rows, terms):
    """Brute-force str.count model over normalized text."""
    import re

    out = {}
    for doc_id, text in docs_rows:
        norm = re.sub(r"\s+", " ", text.strip().lower())
        for t in terms:
            c = norm.count(t)
            if c:
                out[(doc_id, t)] = c
    return out


CRAFTED = [
    (1, "she sells seashells; he helps his heirs"),
    (2, "aaaa aa baaab"),
    (3, "  Scan   FAST scan fastscan fast  "),
    (4, "nothing matching here at all—"),
    (5, "hehehehe"),
]


def test_sql_kernel_matches_model(spark):
    docs = spark.createDataFrame(CRAFTED, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): r["n_hits"]
        for r in blocklist_hits(docs, TERMS, kernel="sql").collect()
    }
    assert got == _model(CRAFTED, TERMS)


def test_arrow_kernel_equals_sql_kernel(spark):
    docs = spark.createDataFrame(CRAFTED, "doc_id long, text string")
    sql = {
        (r["doc_id"], r["term"]): r["n_hits"]
        for r in blocklist_hits(docs, TERMS, kernel="sql").collect()
    }
    arrow = {
        (r["doc_id"], r["term"]): r["n_hits"]
        for r in blocklist_hits(docs, TERMS, kernel="arrow").collect()
    }
    assert arrow == sql


def test_kernels_agree_on_real_corpus(spark, sf_dir):
    """Corpus-wide equality on the driver's documents table with
    common-vocabulary terms (guaranteed hits and cross-word substring
    matches like 'a' inside 'table')."""
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    terms = ["table", "scan", "a", "fast merge"]
    sql = {
        (r["term"],): (r["n_docs"], r["n_hits"], r["doc_id_sum"])
        for r in blocklist_summary(docs, terms, kernel="sql").collect()
    }
    arrow = {
        (r["term"],): (r["n_docs"], r["n_hits"], r["doc_id_sum"])
        for r in blocklist_summary(docs, terms, kernel="arrow").collect()
    }
    assert sql == arrow
    assert sql[("a",)][0] > 0  # sanity: the corpus actually hits


def test_filter_gate_drops_only_offenders(spark):
    docs = spark.createDataFrame(CRAFTED, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in blocklist_filter(docs, ["he"], max_hits=2).collect()
    }
    # doc 1 has 'he'x3 ('he', 'helps', 'heirs'), doc 5 has 4 -> dropped
    assert kept == {2, 3, 4}


def test_normalization_is_applied(spark):
    """Matching happens on normalized text: case-folded, whitespace
    collapsed — 'Scan   FAST' hits 'scan fast'."""
    docs = spark.createDataFrame([CRAFTED[2]], "doc_id long, text string")
    got = {
        r["term"]: r["n_hits"]
        for r in blocklist_hits(docs, ["scan fast"]).collect()
    }
    assert got == {"scan fast": 3}
