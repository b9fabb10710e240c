"""Phrase search: consecutive-run semantics, overlap counting, casing,
and edge cases the positional-join oracle also has to get right."""

from __future__ import annotations

import pytest

from myasynstreamjoin_spark.functions.retrieval import phrase_search


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_consecutive_only(spark):
    docs = _docs(
        spark,
        [
            "a b c d",        # match
            "a x b c",        # 'b c' present but not after 'a'
            "b c a",          # right tokens, wrong order
            "x a b c",        # match mid-document
        ],
    )
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, "a b c").collect()}
    assert got == {0: 1, 3: 1}


def test_overlapping_occurrences_counted(spark):
    docs = _docs(spark, ["a a a a"])
    got = phrase_search(docs, "a a").collect()
    assert got[0].n_matches == 3


def test_case_insensitive_and_single_token(spark):
    docs = _docs(spark, ["Hello World", "goodbye world"])
    got = {r.doc_id for r in phrase_search(docs, "WORLD").collect()}
    assert got == {0, 1}


def test_phrase_longer_than_doc(spark):
    docs = _docs(spark, ["a b"])
    assert phrase_search(docs, "a b c").count() == 0


def test_empty_phrase_rejected(spark):
    with pytest.raises(ValueError):
        phrase_search(_docs(spark, ["a"]), "   ")
