"""BPE training vs a pure-Python reference implementation (the
Sennrich word-frequency algorithm), plus segmentation invariants."""

from __future__ import annotations

from collections import Counter

from myasynstreamjoin_spark.functions.bpe import (
    END,
    bpe_encode,
    bpe_segment,
    bpe_train,
    bpe_vocab_ids,
)


def _reference_bpe(texts, n_merges):
    """Plain-Python BPE with the same deterministic tiebreak
    (count desc, then pair lexicographic asc)."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    vocab = {w: list(w) + [END] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), c = best
        merges.append((a, b, a + b, c))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bpe_train_matches_reference(spark):
    got = [
        (r.left, r.right, r.merged, r.pair_freq)
        for r in bpe_train(_docs(spark), n_merges=8).orderBy("step").collect()
    ]
    expect, _ = _reference_bpe(TEXTS, 8)
    assert got == expect


def test_bpe_train_deterministic(spark):
    a = [tuple(r) for r in bpe_train(_docs(spark), n_merges=5).collect()]
    b = [tuple(r) for r in bpe_train(_docs(spark), n_merges=5).collect()]
    assert a == b and len(a) == 5


def test_bpe_segment_counts_match_reference_vocab(spark):
    n = 8
    merges_df = bpe_train(_docs(spark), n_merges=n).orderBy("step").collect()
    merges = [(r.left, r.right) for r in merges_df]
    seg = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_segment(_docs(spark), merges).collect()
    }
    _, vocab = _reference_bpe(TEXTS, n)
    for i, t in enumerate(TEXTS):
        ws = t.lower().split()
        expect = sum(len(vocab[w]) for w in ws)
        assert seg[i] == (len(ws), expect)


def test_bpe_encode_counts_match_per_occurrence_path(spark):
    # the vocab-once encode must agree with the per-occurrence
    # reference segmentation on every document's token count
    docs = _docs(spark)
    merges = [
        (r.left, r.right)
        for r in bpe_train(docs, 8).orderBy("step").collect()
    ]
    fast = {r.doc_id: r.n_bpe_tokens for r in bpe_encode(docs, merges).collect()}
    ref = {r.doc_id: r.n_bpe_tokens for r in bpe_segment(docs, merges).collect()}
    assert fast == ref


def test_bpe_encode_ids_decode_back_to_the_text(spark):
    # id → symbol round trip: concatenating decoded symbols and
    # splitting at end-of-word markers reproduces the normalized words
    docs = _docs(spark)
    merges = [
        (r.left, r.right)
        for r in bpe_train(docs, 6).orderBy("step").collect()
    ]
    id2sym = {v: k for k, v in bpe_vocab_ids(docs, merges).items()}
    rows = bpe_encode(docs, merges).collect()
    assert len(rows) == len(TEXTS)
    for r in rows:
        decoded = "".join(id2sym[i] for i in r.token_ids)
        words = [w for w in decoded.split(END) if w]
        assert words == TEXTS[r.doc_id].lower().split()


def test_bpe_vocab_ids_layout_is_deterministic(spark):
    docs = _docs(spark)
    merges = [
        (r.left, r.right)
        for r in bpe_train(docs, 4).orderBy("step").collect()
    ]
    v1 = bpe_vocab_ids(docs, merges)
    v2 = bpe_vocab_ids(docs, merges)
    assert v1 == v2
    alphabet = [s for s in v1 if len(s) == 1 or s == END]
    base_ids = sorted(v1[s] for s in alphabet)
    # alphabet occupies a dense prefix; merges follow in step order
    assert base_ids == list(range(len(alphabet)))
    for step, (a, b) in enumerate(merges):
        if a + b not in alphabet:
            assert v1[a + b] == len(alphabet) + step


def test_more_merges_never_increase_token_count(spark):
    docs = _docs(spark)
    m8 = [(r.left, r.right) for r in bpe_train(docs, 8).orderBy("step").collect()]
    short = {r.doc_id: r.n_bpe_tokens for r in bpe_segment(docs, m8[:3]).collect()}
    full = {r.doc_id: r.n_bpe_tokens for r in bpe_segment(docs, m8).collect()}
    assert all(full[d] <= short[d] for d in short)
