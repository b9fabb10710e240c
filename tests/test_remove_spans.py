"""Edge semantics of remove_duplicate_spans (functions/dedup.py) —
the ExactSubstr-style span-removal operator. Corpus-level parity with
the DuckDB oracle is covered by test_oracle_parity (q_remove_spans);
these pin the policy decisions on hand-built corpora.
"""

from __future__ import annotations

from myasynstreamjoin_spark.functions.dedup import remove_duplicate_spans


def _run(spark, rows, k=8):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in remove_duplicate_spans(docs, k=k).collect()
    }


def test_exact_duplicate_doc_empties_and_canonical_survives(spark):
    out = _run(
        spark,
        [(0, "a b c d e f g h i j"), (1, "a b c d e f g h i j")],
    )
    assert out[0] == (10, 0, "a b c d e f g h i j")
    assert out[1] == (10, 10, "")


def test_embedded_duplicate_span_is_cut(spark):
    out = _run(
        spark,
        [(0, "a b c d e f g h i j"), (2, "x y a b c d e f g h z")],
    )
    assert out[0] == (10, 0, "a b c d e f g h i j")
    assert out[2] == (11, 8, "x y z")


def test_intra_doc_repeat_keeps_first_occurrence(spark):
    # the 8-gram "a b c d e f g h" occurs at pos 0 and pos 8 of the
    # SAME doc; the second occurrence is cut
    out = _run(spark, [(0, "a b c d e f g h a b c d e f g h")])
    assert out[0] == (16, 8, "a b c d e f g h")


def test_short_and_null_docs(spark):
    out = _run(spark, [(0, "too short"), (1, None)])
    assert out == {0: (2, 0, "too short")}


def test_canonical_order_is_doc_then_pos(spark):
    # same span in doc 5 and doc 3: doc 3 (lower id) is canonical even
    # though doc 5 was listed first
    out = _run(
        spark,
        [(5, "p q a b c d e f g h"), (3, "a b c d e f g h r s")],
    )
    assert out[3] == (10, 0, "a b c d e f g h r s")
    assert out[5] == (10, 8, "p q")


def test_hashed_grams_match_exact_strings(spark, sf_dir):
    """The scale setting (8-byte xxhash64 election keys) must produce
    the identical cleaned corpus at test scale — collisions are the
    only divergence mode and they're 2^-64."""
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = sorted(
        tuple(r) for r in remove_duplicate_spans(docs, k=8).collect()
    )
    hashed = sorted(
        tuple(r) for r in remove_duplicate_spans(docs, k=8, hashed=True).collect()
    )
    md5 = sorted(
        tuple(r)
        for r in remove_duplicate_spans(docs, k=8, hashed="md5").collect()
    )
    assert exact == hashed == md5
