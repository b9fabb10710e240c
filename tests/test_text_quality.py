"""Crafted-input tests for the text-quality / decontamination operators
(oracle parity covers the fixture tables; these pin the semantics on
documents constructed to hit the boundaries)."""

from __future__ import annotations

from myasynstreamjoin_spark.functions.dedup import contamination_pairs
from myasynstreamjoin_spark.functions.text import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_finds_planted_overlap_only(spark):
    phrase = "the quick brown fox jumps over the lazy dog tonight"
    bench = _docs(spark, [(1, f"benchmark question: {phrase} answer")])
    train = _docs(
        spark,
        [
            (10, f"prefix words here {phrase} suffix words"),  # contains 8-gram
            (11, "completely different text with no overlap at all here"),
            (12, "the quick brown fox jumps over seven lazy dogs"),  # < 8 shared
        ],
    )
    got = {
        (r.train_id, r.bench_id): r.n_shared
        for r in contamination_pairs(train, bench, k=8).collect()
    }
    assert set(got) == {(10, 1)}
    # phrase has 10 tokens → 3 shared 8-grams
    assert got[(10, 1)] == 3


def test_repetition_ratio_boundaries(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c a b c a b c"),     # 9 toks → 7 grams, 3 distinct
            (2, "all tokens unique in this document"),
            (3, "tiny doc"),              # < k tokens → 1 gram, no repeats
        ],
    )
    got = {r.doc_id: (r.n_grams, r.rep_ratio) for r in
           repetition_stats(docs, k=3).collect()}
    assert got[1] == (7, round(4 / 7, 6))
    assert got[2][1] == 0.0
    assert got[3] == (1, 0.0)


def test_domain_kl_zero_for_identical_distributions(spark):
    from myasynstreamjoin_spark.functions.text import domain_kl

    # two sources with the SAME text multiset → both match the corpus
    rows = [(i, "a b c d", "s1") for i in range(10)] + [
        (i + 10, "a b c d", "s2") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r.kl for r in domain_kl(df).collect()}
    assert got == {"s1": 0.0, "s2": 0.0}


def test_domain_kl_flags_the_drifted_source(spark):
    from myasynstreamjoin_spark.functions.text import domain_kl

    rows = (
        [(i, "the quick brown fox jumps", "clean") for i in range(20)]
        + [(100 + i, "the quick brown fox jumps", "drifted") for i in range(2)]
        + [(200 + i, "buy pills buy pills buy pills", "drifted") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r.kl for r in domain_kl(df).collect()}
    assert got["drifted"] > got["clean"] >= 0
    assert got["drifted"] > 0.1


def test_lm_perplexity_oov_smoothing_on_disjoint_corpus(spark):
    """Scoring docs against an LM trained on a different corpus: OOV
    tokens take the add-one floor probability 1/(T+V+1), so an
    all-OOV doc scores exactly -ln(1/(T+V+1)) per token and worse
    than any in-vocabulary doc."""
    import math

    from myasynstreamjoin_spark.functions.text import lm_perplexity

    lm = spark.createDataFrame(
        [(100 + i, "aaa bbb ccc ddd") for i in range(5)],
        "doc_id long, text string",
    )  # T = 20 tokens, V = 4 types
    docs = spark.createDataFrame(
        [(0, "aaa bbb"), (1, "zzz qqq")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm_perplexity(docs, lm_docs=lm).collect()}
    # in-vocab: p = (5+1)/25; OOV: p = 1/25
    assert abs(got[0].nll - (-math.log(6 / 25))) < 1e-6
    assert abs(got[1].nll - (-math.log(1 / 25))) < 1e-6
    assert got[1].ppl > got[0].ppl


def test_bigram_lm_penalizes_scrambled_text(spark):
    """Same unigram distribution, destroyed word order: the bigram LM
    must score the scrambled doc strictly worse while the pure unigram
    model cannot tell them apart."""
    from myasynstreamjoin_spark.functions.text import (
        lm_perplexity,
        lm_perplexity_bigram,
    )

    fluent = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    lm = spark.createDataFrame(
        [(100 + i, fluent) for i in range(20)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(0, fluent), (1, scrambled)], "doc_id long, text string"
    )
    uni = {r.doc_id: r.ppl for r in lm_perplexity(docs, lm_docs=lm).collect()}
    big = {r.doc_id: r.ppl
           for r in lm_perplexity_bigram(docs, lm_docs=lm).collect()}
    assert uni[0] == uni[1]          # unigram is order-blind
    assert big[1] > big[0] * 2       # bigram sees the broken order


def test_bigram_lm_single_token_docs_score_unigram(spark):
    from myasynstreamjoin_spark.functions.text import (
        lm_perplexity,
        lm_perplexity_bigram,
    )

    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "bbb")], "doc_id long, text string"
    )
    uni = {r.doc_id: (r.n_tokens, r.nll)
           for r in lm_perplexity(docs).collect()}
    big = {r.doc_id: (r.n_tokens, r.nll)
           for r in lm_perplexity_bigram(docs).collect()}
    assert uni == big


def test_collocations_lift_semantics(spark):
    """Hand-built corpus: a fixed phrase ('new york') has lift ≫ 1;
    a pair that co-occurs exactly at independence rate is excluded."""
    from myasynstreamjoin_spark.functions.text import collocations

    docs = spark.createDataFrame(
        [(i, "new york " + "filler%d other%d " % (i, i) * 3) for i in range(6)],
        "doc_id long, text string",
    )
    out = {(r.tok_a, r.tok_b): r.lift for r in collocations(docs, 5, 1.2).collect()}
    assert ("new", "york") in out
    assert out[("new", "york")] > 1.2


def test_char_entropy_known_values(spark):
    """Single-character docs score 0; a uniform k-char doc scores
    ln(k); repeated-char gibberish scores far below normal prose."""
    import math

    from myasynstreamjoin_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [
            (0, "aaaaaaaa"),                 # one char type -> H = 0
            (1, "abcd"),                     # uniform over 4 -> ln 4
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, ""),                         # empty -> excluded
            (4, None),                       # null -> excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["entropy"] == 0.0
    assert abs(out[1]["entropy"] - math.log(4)) < 1e-5
    assert out[1]["n_distinct"] == 4
    # prose uses a wide alphabet: far higher entropy than gibberish
    assert out[2]["entropy"] > out[0]["entropy"] + 2.0


def test_char_entropy_nano_grain_is_integer_and_consistent(spark):
    """grain='nano' (the oracle-facing contract) emits the summed
    nano-nat as BIGINT; the micro default must equal its HALF_UP
    re-rounding — (nano + 500) DIV 1000 — on every doc, and the nano
    grain must be rejected on the arrow kernel (micro only)."""
    import pytest

    from myasynstreamjoin_spark.functions.text import char_entropy

    docs = spark.createDataFrame(
        [
            (0, "aaaaaaaa"),
            (1, "abcd"),
            (2, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    nano = {r["doc_id"]: r for r in char_entropy(docs, grain="nano").collect()}
    micro = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert set(nano) == set(micro)
    for i in nano:
        assert isinstance(nano[i]["nano_entropy"], int)
        assert micro[i]["entropy"] == (
            (nano[i]["nano_entropy"] + 500) // 1000
        ) / 1e6
    with pytest.raises(ValueError):
        char_entropy(docs, grain="deci")
    with pytest.raises(ValueError):
        char_entropy(docs, kernel="arrow", grain="nano")


def test_char_entropy_arrow_twin_matches_sql_kernel(spark, sf_dir):
    """Integer columns identical; entropy within the documented
    1-micro-nat libm tolerance, over the whole driver corpus."""
    from myasynstreamjoin_spark.functions.text import char_entropy
    from myasynstreamjoin_spark.sources.tables import load_table

    import pytest

    docs = load_table(spark, sf_dir, "documents")
    sql = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    arrow = {r["doc_id"]: r for r in char_entropy(docs, kernel="arrow").collect()}
    assert set(sql) == set(arrow)
    for i in sql:
        assert (sql[i]["n_chars"], sql[i]["n_distinct"]) == (
            arrow[i]["n_chars"], arrow[i]["n_distinct"])
        assert abs(sql[i]["entropy"] - arrow[i]["entropy"]) <= 1e-6
    with pytest.raises(ValueError):
        char_entropy(docs, kernel="nope")


def test_ccnet_buckets_tercile_rule_and_ordering(spark):
    """Within every source: bucket sizes follow the integer rank rule
    (head = floor(n/3), middle = floor(2n/3) - floor(n/3)), and every
    head doc's perplexity ≤ every middle's ≤ every tail's."""
    from myasynstreamjoin_spark.functions.text import ccnet_buckets

    rows = []
    # source A: 7 LM-like docs + junk-graded docs → clear ppl spread
    common = "the quick brown fox jumps over the lazy dog"
    for i in range(7):
        rows.append((i, common, "en", "A", len(common)))
    rows.append((7, "zzz qqq xxx vvv kkk jjj", "en", "A", 23))
    rows.append((8, "aaa bbb " + common, "en", "A", 50))
    # source B: 4 docs
    for i in range(4):
        rows.append((10 + i, common + f" extra{i}", "en", "B", 60))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = ccnet_buckets(docs).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        n = len(rs)
        sizes = {
            b: sum(1 for r in rs if r["bucket"] == b)
            for b in ("head", "middle", "tail")
        }
        assert sizes["head"] == n // 3
        assert sizes["middle"] == (2 * n) // 3 - n // 3
        assert sizes["tail"] == n - (2 * n) // 3
        hi = {"head": 0, "middle": 1, "tail": 2}
        srt = sorted(rs, key=lambda r: (r["ppl"], r["doc_id"]))
        assert [hi[r["bucket"]] for r in srt] == sorted(
            hi[r["bucket"]] for r in srt
        )
    # determinism: a second run buckets identically
    again = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(docs).collect()}
    assert again == {r["doc_id"]: r["bucket"] for r in out}
