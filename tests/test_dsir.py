"""DSIR importance-resampling selection (functions/dsir.py).

Behavioral contract beyond the q_dsir oracle parity:
- discrimination: documents written in the target's vocabulary
  outscore off-target documents;
- determinism: re-execution selects the same corpus in the same order;
- unscoreable (NULL/empty-text) documents never appear;
- the model stays bucket-bounded (the broadcast table is the scale
  argument).
"""

from __future__ import annotations

from myasynstreamjoin_spark.functions.dsir import dsir_select, dsir_weights

# All corpus docs are exactly 8 tokens: DSIR's weight is a SUM of
# per-gram log-ratios (paper-faithful, length-additive), so holding
# length fixed makes the ranking purely about content.
TARGETY = [
    "the cat sat on the mat with hat",
    "a cat and a hat and a mat",
    "the hat the cat the mat sat on",
]
OFFTARGET = [
    "quantum flux capacitor engaged warp drive last night",
    "tensor gradients propagate backward through deep network layers",
]


def _docs(spark):
    rows = []
    for i, t in enumerate(TARGETY):
        rows.append((i, t))
    for i, t in enumerate(OFFTARGET):
        rows.append((100 + i, t))
    rows.append((900, None))  # unscoreable
    rows.append((901, "   "))  # whitespace-only -> no grams
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target(spark):
    # A target SAMPLE, not a single doc: with add-one smoothing over
    # n_buckets, a tiny target leaves every bucket ratio near the
    # smoothing floor and the weights can't discriminate (observed:
    # 1 target doc ranks an off-target doc above a target-vocabulary
    # doc). Ten docs of on-vocabulary text give target buckets real
    # mass, which is how DSIR is meant to be fit.
    texts = [
        "the cat in the hat sat on a mat",
        "a cat sat on the mat with the hat",
        "the mat and the hat and the cat",
        "the cat sat and the hat sat",
        "a hat on a mat on a cat",
        "the cat the mat the hat sat on",
        "cat and hat sat on the mat",
        "the hat sat on the cat mat",
        "a cat a hat a mat sat",
        "the cat sat on a hat mat",
    ]
    return spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_targety_docs_outscore_offtarget(spark):
    w = dsir_weights(_docs(spark), _target(spark), n_buckets=256)
    by_id = {r["doc_id"]: r["nano"] for r in w.collect()}
    worst_targety = min(by_id[i] for i in range(len(TARGETY)))
    best_offtarget = max(by_id[100 + i] for i in range(len(OFFTARGET)))
    assert worst_targety > best_offtarget


def test_select_is_deterministic_and_ordered(spark):
    docs, tgt = _docs(spark), _target(spark)
    a = dsir_select(docs, tgt, k=3, n_buckets=256).collect()
    b = dsir_select(docs, tgt, k=3, n_buckets=256).collect()
    assert a == b
    assert [r["doc_id"] for r in a] == [2, 0, 1]


def test_unscoreable_docs_excluded(spark):
    w = dsir_weights(_docs(spark), _target(spark), n_buckets=256)
    ids = {r["doc_id"] for r in w.collect()}
    assert 900 not in ids and 901 not in ids
    assert ids == {0, 1, 2, 100, 101}


def test_model_is_bucket_bounded(spark, sf_dir):
    """The broadcastable weight table can never exceed n_buckets rows,
    whatever the corpus size — the 100 TB argument."""
    from myasynstreamjoin_spark.functions.dsir import _doc_gram_buckets
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_b = 64
    distinct_buckets = (
        _doc_gram_buckets(docs, n_b).select("b").distinct().count()
    )
    assert distinct_buckets <= n_b


def test_weights_shift_with_target(spark):
    """Swapping the target to the off-target vocabulary flips the
    ranking — the weight is a property of the target, not the corpus."""
    docs = _docs(spark)
    flipped_target = spark.createDataFrame(
        [(2000, "quantum tensor warp gradients flux")],
        "doc_id long, text string",
    )
    w = dsir_weights(docs, flipped_target, n_buckets=256)
    by_id = {r["doc_id"]: r["nano"] for r in w.collect()}
    assert max(by_id[100], by_id[101]) > max(by_id[i] for i in range(3))
