"""Python UDTF tier (U1): real multi-sentence segmentation semantics
the punctuation-free driver fixture can't exercise."""

from __future__ import annotations

from myasynstreamjoin_spark.functions.udtf_ops import split_sentences


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_multi_sentence_split_and_indexing(spark):
    docs = _docs(spark, ["Hello world. How are you?  Fine!  ", "one two"])
    rows = sorted(
        (r.doc_id, r.sent_idx, r.sentence, r.n_tokens)
        for r in split_sentences(spark, docs).collect()
    )
    assert rows == [
        (0, 0, "hello world", 2),
        (0, 1, "how are you", 3),
        (0, 2, "fine", 1),
        (1, 0, "one two", 2),
    ]


def test_empty_segments_and_null_text_dropped(spark):
    docs = _docs(spark, ["...", None, "a.. b"])
    rows = sorted(
        (r.doc_id, r.sent_idx, r.sentence)
        for r in split_sentences(spark, docs).collect()
    )
    assert rows == [(2, 0, "a"), (2, 1, "b")]


def test_whitespace_collapsed_inside_sentences(spark):
    docs = _docs(spark, ["A  B\tC. D"])
    rows = {r.sentence: r.n_tokens for r in split_sentences(spark, docs).collect()}
    assert rows == {"a b c": 3, "d": 1}
