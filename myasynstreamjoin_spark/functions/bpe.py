"""Distributed BPE tokenizer training + segmentation — the
tokenizer-prep stage of an LLM data pipeline, built the way BPE
actually distributes: the corpus is scanned ONCE into a (word,
frequency, symbols) table, and every merge iteration runs on that
vocabulary-sized table, never on the corpus again (Sennrich et al.
2016's word-frequency formulation).

Per iteration:
- adjacent-pair counts: a JVM zip of two shifted symbol slices,
  exploded and summed weighted by word frequency — one shuffle of
  |vocab|·avg-len rows;
- the winning pair is a 1-row control read (count desc, pair asc —
  deterministic tiebreak), the same driver-sized plan-decision read
  the cost models use;
- the merge applies via an Arrow-batched sequential scan per word
  (mapInPandas — the merge is inherently order-dependent within a
  word, the one thing array expressions can't do), then
  localCheckpoint: 30+ nested mapInPandas plans would otherwise stack
  into one giant lineage (see SCALE.md's persist-vs-checkpoint rule).

At 100 TB the vocabulary is millions of rows — still three orders of
magnitude under the corpus; sampling the corpus for the ONE counting
scan is the standard further reduction and composes trivially
(`docs.sample(...)` upstream).

No SQL oracle can replay an iterative argmax (rows-only by design);
correctness is pinned by pytest against a pure-Python reference BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.text import bigrams, tokens

END = "</w>"


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _chars_with_end(word_col: str):
    # per-character split + end-of-word marker, so suffix merges stay
    # distinct from mid-word merges (classic BPE)
    return F.expr(
        f"concat(transform(sequence(1, length({word_col})),"
        f" i -> substring({word_col}, i, 1)), array('{END}'))"
    )


def _merge_symbols(symbols: list[str], a: str, b: str) -> list[str]:
    out = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _apply_merge(a: str, b: str):
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["symbols"] = [
                _merge_symbols(list(s), a, b) for s in pdf["symbols"]
            ]
            yield pdf

    return fn


def bpe_train(
    docs: DataFrame, n_merges: int = 30, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    Output: (step, left, right, merged, pair_freq) — the ordered merge
    table a tokenizer ships; deterministic for a given corpus.
    """
    spark = docs.sparkSession
    words = (
        _word_freqs(docs, text_col)
        .select("word", "freq", _chars_with_end("word").alias("symbols"))
        .localCheckpoint(eager=True)
    )
    merges = []
    for step in range(n_merges):
        n = F.size("symbols")
        pairs = bigrams(
            "symbols", lambda x, y: F.struct(x.alias("l"), y.alias("r"))
        )
        best = (
            words.where(n >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < 2:
            break
        a, b, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((step, a, b, a + b, c))
        words = words.mapInPandas(
            _apply_merge(a, b), schema="word string, freq long, symbols array<string>"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_freq long"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to every document: the REAL token
    count under the trained tokenizer (vs the regex estimate in
    ``text.bpe_ish_tokens``). Arrow-batched; merges ride the closure.

    Output: (doc_id, n_words, n_bpe_tokens).
    """
    import pandas as pd

    ordered = list(merges)

    def fn(batches):
        for pdf in batches:
            n_words, n_toks = [], []
            for text in pdf["text_norm"]:
                ws = [w for w in text.split(" ") if w]
                total = 0
                for w in ws:
                    syms = list(w) + [END]
                    for a, b in ordered:
                        syms = _merge_symbols(syms, a, b)
                    total += len(syms)
                n_words.append(len(ws))
                n_toks.append(total)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_words": n_words, "n_bpe_tokens": n_toks}
            )

    prepped = docs.select(
        id_col,
        F.array_join(tokens(text_col), " ").alias("text_norm"),
    )
    return prepped.mapInPandas(
        fn, schema=f"{id_col} long, n_words long, n_bpe_tokens long"
    )


def bpe_vocab_ids(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> dict[str, int]:
    """Deterministic symbol → token-id table for a trained merge list:
    the base alphabet (every distinct character in the corpus + the
    end-of-word marker) sorted lexically takes ids 0..A-1, then each
    merge's output takes A+step — the id layout BPE tokenizers ship.
    The alphabet scan is one distinct over corpus characters (a
    map-side-combined groupBy yielding at most a few thousand rows);
    the collect is a driver-sized control read like the cost models'.
    """
    rows = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w") != "")
        .select(F.explode(F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        )).alias("c"))
        .distinct()
        .collect()
    )
    alphabet = sorted({r["c"] for r in rows} | {END})
    sym2id = {s: i for i, s in enumerate(alphabet)}
    for step, (a, b) in enumerate(merges):
        sym2id.setdefault(a + b, len(alphabet) + step)
    return sym2id


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ENCODE every document to BPE token ids — the tokenize step a
    training pipeline runs before packing, built the way it scales:
    the merge loop runs ONCE PER DISTINCT WORD (the vocabulary table,
    orders of magnitude under the corpus — `bpe_segment` by contrast
    re-segments every occurrence), then the word → ids mapping joins
    back onto the corpus word stream and flattens in word order.

    Scale shape: one distinct on words, one Arrow-batched mapInPandas
    over the VOCAB-sized table, one join of the occurrence stream
    against the vocab (AQE broadcasts it while it fits; at a 100 TB
    corpus the vocab is millions of rows — still a fine shuffle-hash
    build side), one groupBy per doc. No SQL oracle can replay an
    iterative merge loop (rows-only by design); parity with the
    per-occurrence reference path and a decode round trip are pinned
    in tests/test_bpe.py.

    Output: (doc_id, n_bpe_tokens, token_ids array<int>).
    """
    import pandas as pd

    ordered = list(merges)
    sym2id = bpe_vocab_ids(docs, merges, text_col=text_col)

    def seg(batches):
        for pdf in batches:
            out = []
            for w in pdf["word"]:
                syms = list(w) + [END]
                for a, b in ordered:
                    syms = _merge_symbols(syms, a, b)
                out.append([sym2id[s] for s in syms])
            yield pd.DataFrame({"word": pdf["word"], "ids": out})

    occurrences = docs.select(
        id_col, F.posexplode(tokens(text_col)).alias("pos", "word")
    ).where(F.col("word") != "")
    word_ids = (
        occurrences.select("word")
        .distinct()
        .mapInPandas(seg, schema="word string, ids array<int>")
    )
    return (
        occurrences.join(word_ids, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ids"))),
                    lambda s: s["ids"],
                )
            ).alias("token_ids")
        )
        .select(
            id_col,
            F.size("token_ids").cast("long").alias("n_bpe_tokens"),
            "token_ids",
        )
    )
