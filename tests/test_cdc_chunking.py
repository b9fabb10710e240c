"""Content-defined chunking dedup (functions/dedup.py::cdc_chunks /
cdc_dedup_stats).

The property that makes CDC worth having next to fixed-k shingles:
boundaries are a function of LOCAL content (rolling window hash), so
an insertion shifts only the chunks it touches and the remainder of
the document keeps its chunk identity — pinned here against a
character-exact Python model and on the resync behavior itself.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.dedup import cdc_chunks, cdc_dedup_stats

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again", "web"),
    (1, "the quick brown fox jumps over the lazy dog again and again", "web"),
    (2, "PREFIX INSERTED. the quick brown fox jumps over the lazy dog again and again", "web"),
    (3, "short", "book"),       # below the window width -> one chunk
    (4, "", "book"),            # empty -> contributes nothing
    (5, "x" * 200, "book"),     # pathological repetition
]


def _df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    )


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _model_chunks(text: str, w: int = 8, d: int = 64):
    length = len(text)
    if length == 0:
        return []
    if length < w:
        ends = [length]
    else:
        ends = sorted(
            set(
                i
                for i in range(w, length + 1)
                if _md5_32(text[i - w:i]) % d == 0
            )
            | {length}
        )
    out, start = [], 1
    for e in ends:
        chunk = text[start - 1:e]
        out.append((hashlib.md5(chunk.encode()).hexdigest(), e - start + 1))
        start = e + 1
    return out


def test_chunks_match_character_exact_model(spark):
    want = sorted(
        (doc_id, source, h, ln)
        for doc_id, text, source in DOCS
        for h, ln in _model_chunks(text)
    )
    got = sorted(
        (r.doc_id, r.source, r.chunk_hash, r.chunk_len)
        for r in cdc_chunks(_df(spark)).collect()
    )
    assert got == want


def test_chunks_cover_text_exactly(spark):
    """Chunk lengths per doc must sum to the doc's length — no gap,
    no overlap, for every boundary pattern in the fixture."""
    got = (
        cdc_chunks(_df(spark))
        .groupBy("doc_id")
        .agg(F.sum("chunk_len").alias("n"))
        .collect()
    )
    want = {doc_id: len(text) for doc_id, text, _ in DOCS if text}
    assert {r["doc_id"]: r["n"] for r in got} == want


def test_insertion_resyncs_chunk_identity(spark):
    """Doc 2 is doc 0 with a prefix inserted: fixed-position chunking
    would share nothing, content-defined chunking must re-synchronize
    after the edit and share the trailing chunks."""
    rows = cdc_chunks(_df(spark)).collect()
    c0 = Counter(r.chunk_hash for r in rows if r.doc_id == 0)
    c2 = Counter(r.chunk_hash for r in rows if r.doc_id == 2)
    assert sum((c0 & c2).values()) >= 1


def test_stats_are_exact_integers_and_consistent(spark):
    stats = {r["source"]: r.asDict() for r in cdc_dedup_stats(_df(spark)).collect()}
    web, book = stats["web"], stats["book"]
    # docs 0/1 identical -> every doc-0 chunk duplicated at least once
    assert web["dup_chunks"] >= 3
    assert web["n_chunks"] == web["n_unique_chunks"] + web["dup_chunks"]
    assert web["total_chars"] == sum(
        len(t) for _, t, s in DOCS if s == "web"
    )
    assert web["dup_ppm"] == web["dup_chunks"] * 1_000_000 // web["n_chunks"]
    # the empty doc is excluded from n_docs
    assert book["n_docs"] == 2
    assert book["dup_chunks"] == 0


def test_chunk_extraction_is_map_only(spark):
    """Everything up to chunk grain must be a narrow projection — the
    first exchange a consumer pays is its own aggregation. A shuffle
    before the explode means boundary computation stopped being
    per-row."""
    plan = (
        cdc_chunks(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
