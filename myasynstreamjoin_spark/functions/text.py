"""Text-analysis operators over the ``documents`` table.

Beyond-reference surface (SURVEY.md §7 phase 5): the column-level text
ops a training-data pipeline needs — tokenization, quality scoring,
language ID, fingerprinting. All pure ``pyspark.sql.functions``
expressions (JVM-side, whole-stage codegen; no Python in the hot path),
so they scale linearly with input and push column pruning into the scan
(only ``doc_id``/``text`` are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Minimal English stopword list for the n-gram language heuristic.
#: Deterministic and tiny on purpose: it is replicated into the oracle
#: SQL, so both engines score identically.
EN_STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "this", "that", "from", "or", "be",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text (lower + trim +
    collapse runs of whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def bigrams(arr: Column | str, combine) -> Column:
    """Adjacent-element pairs of an array column: one ``zip_with`` of
    the two off-by-one slices, combined per pair by ``combine(l, r)``
    (a lambda returning any Column — struct, concat, …). The shared
    core of BPE merge counting (`bpe.py`), bigram LM training
    (`lm_perplexity*`), and DSIR gram hashing (`dsir.py`).

    Arrays with fewer than 2 elements yield an EMPTY array (the slice
    length is clamped to ≥ 0, so callers need no ``size >= 2`` guard —
    though adding one as a row filter is still a useful plan-level
    skip). Empty-token ("") filtering is deliberately the CALLER's
    contract, applied per use: `tokens()` can emit "" for empty input
    strings, and which grams must drop them differs by operator (the
    bigram LM drops any pair touching "", DSIR drops "" unigrams but
    scores bigrams as-is — both choices are mirrored in their oracles).
    """
    a = F.col(arr) if isinstance(arr, str) else arr
    m = F.greatest(F.size(a) - F.lit(1), F.lit(0))
    return F.zip_with(F.slice(a, 1, m), F.slice(a, 2, m), combine)


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish subword split: runs of letters, runs of digits, or single
    punctuation marks — the standard pre-tokenizer regex shape used for
    rough token counting when no real tokenizer is available."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1)


def normalized(col: Column | str) -> Column:
    """Canonical text form used for fingerprints and exact dedup:
    lowercase, trimmed, internal whitespace collapsed to single spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document statistics: token counts, distinct tokens, char
    counts, average token length — the cheap quality signals.

    Output: (doc_id, n_tokens, n_distinct_tokens, n_chars_norm,
    avg_token_len, n_bpe_tokens).
    """
    toks = tokens("text")
    norm = normalized("text")
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.round(
            (F.length(norm) - (n_tokens - F.lit(1))) / n_tokens, 4
        ).alias("avg_token_len"),
        F.size(bpe_ish_tokens("text")).cast("long").alias("n_bpe_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: lexical diversity (distinct /
    total tokens) damped by a length prior (short docs score low).
    Deterministic arithmetic only — oracle-reproducible.

    Output: (doc_id, quality).
    """
    toks = tokens("text")
    n = F.size(toks)
    diversity = F.size(F.array_distinct(toks)) / n
    length_prior = F.least(n / F.lit(50.0), F.lit(1.0))
    return docs.select(
        "doc_id", F.round(diversity * length_prior, 6).alias("quality")
    )


def lang_id(
    docs: DataFrame, threshold: float = 0.05, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Stopword-ratio language heuristic: fraction of tokens that are
    common English function words; above ``threshold`` → 'en'.

    (A real n-gram model needs corpora not in this container; the
    heuristic keeps the operator shape — per-doc token scan, bounded
    lookup table — identical to what a production langid pass does.)

    Output: (doc_id, en_ratio, lang_guess).
    """
    toks = tokens("text")
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, sw))  # distinct stopwords seen
    ratio = F.round(n_stop / F.size(F.array_distinct(toks)), 6)
    return docs.select(
        "doc_id",
        *keep,
        ratio.alias("en_ratio"),
        F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("other")).alias("lang_guess"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of the normalized text. md5 (not
    xxhash64) so the DuckDB oracle computes bit-identical values.

    Output: (doc_id, fp).
    """
    return docs.select("doc_id", F.md5(F.encode(normalized("text"), "UTF-8")).alias("fp"))


#: PII patterns, written to the common subset of Java regex (Spark)
#: and RE2 (DuckDB) so engine and oracle find the identical spans:
#: no lookaround, no backrefs, greedy quantifiers only.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (pattern, replacement tag); applied in this order, so
    # emails are consumed before their digits can look like phones.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    "phone": (r"\+?[0-9][0-9 ()-]{6,}[0-9]", "[PHONE]"),
}


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact PII-shaped spans (emails, IPv4 addresses,
    phone numbers) — the scrub pass every training-data pipeline runs
    before anything else sees the text.

    Pure JVM-side regexp expressions (codegen, no Python): at 100 TB
    this is a map-only stage that pipelines with the scan — no shuffle,
    and column pruning still reaches parquet. Counts are taken BEFORE
    redaction; replacements are applied in PII_PATTERNS order.

    Output: (doc_id, n_email, n_ipv4, n_phone, clean).
    """
    c = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    clean = c
    for pat, tag in PII_PATTERNS.values():
        clean = F.regexp_replace(clean, pat, tag)
    return docs.select("doc_id", *counts, clean.alias("clean"))


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """TF-IDF: the k highest-scoring terms per document, idf =
    ln((N+1)/(df+1)).

    Scale shape: one shuffle to (doc, term) for tf; the term→df table
    (vocabulary-sized, tiny next to the corpus) and the single-row
    document count are BROADCAST back, so scoring adds no shuffle; the
    final top-k is a per-doc window over the already-(doc,term)-
    partitioned data. Ties broken by term so the ordering is total.

    Output: (doc_id, term, rn, tf, df, score).
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "s",
            F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "term", "rn", "tf", "df",
                F.round("s", 6).alias("score"))
    )


def repetition_stats(docs: DataFrame, k: int = 3) -> DataFrame:
    """Intra-document repetition: the fraction of word k-grams that are
    repeats of an earlier k-gram in the same document — the standard
    "repetitive junk" quality signal (boilerplate, keyword stuffing,
    decoding loops score high).

    Pure per-row array expressions (token slice hashes → distinct
    count), no shuffle at all: the 100 TB form is a map-only pass that
    composes with any downstream filter. Short documents (< k tokens)
    count as one whole-text gram with zero repetition.

    Output: (doc_id, n_grams, rep_ratio).
    """
    # Gram construction: zip k shifted slices of the token array and
    # hash each zipped row. The expensive array is the transform's
    # INPUT (evaluated once), and the lambda touches only its bound
    # element variable. The index-sequence formulation (lambda capturing
    # the outer token expression) re-tokenizes once per element_at per
    # gram — higher-order functions are interpreted, so no
    # common-subexpression elimination saves you (measured 9 s → sub-1 s
    # at sf0.1 for this operator).
    toks = tokens("text")
    n = F.size(toks)
    span = F.greatest(n - k + 1, F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, span) for j in range(k)])
    gram_of = lambda s: F.xxhash64(*[s[str(j)] for j in range(k)])  # noqa: E731
    grams = F.when(n >= k, F.transform(zipped, gram_of)).otherwise(
        F.array(F.xxhash64(F.concat_ws(" ", toks)))
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        total.cast("long").alias("n_grams"),
        F.round(
            (total - distinct).cast("double") / total.cast("double"), 6
        ).alias("rep_ratio"),
    )


def lm_perplexity(docs: DataFrame, lm_docs: DataFrame | None = None) -> DataFrame:
    """Unigram language-model perplexity scoring — the CCNet/KenLM-style
    quality filter: train token counts on ``lm_docs`` (default: the
    corpus itself), score every document by its average negative log
    likelihood under the add-one-smoothed unigram model, and report
    perplexity. Low-ppl docs look like the LM corpus; high-ppl docs are
    junk or out-of-domain — the standard pretraining-data gate.

    Scale shape: the LM is one vocabulary-sized count table BROADCAST
    onto the token stream (the corpus shuffles once, to (doc, term)
    grain); scoring adds no further shuffle. At web scale, cap the
    vocabulary (top-V by count, rest falls into the smoothed OOV mass
    this model already defines) before broadcasting.

    Float determinism (SCALE.md house rules): each token's negative
    log-prob is rounded to integer NANO-NATS and summed as BIGINT —
    integer sums are order-independent, so engines agree regardless of
    row order; the final average is one IEEE division of exact integers.
    A worst-case 1-2 ulp `ln` disagreement between libms moves one token
    by one nano-nat, which is invisible at the reported 6-decimal grain.

    Output: (doc_id, n_tokens, nll, ppl).
    """
    lm = lm_docs if lm_docs is not None else docs
    lm_toks = lm.select(F.explode(tokens("text")).alias("term")).where(
        F.col("term") != ""
    )
    cnt = lm_toks.groupBy("term").agg(F.count("*").alias("c"))
    # t = total training tokens, v = vocabulary size; add-one smoothing
    # gives every (seen or unseen) type probability (c+1)/(t+v+1).
    tot = cnt.agg(F.sum("c").alias("t"), F.count("*").alias("v"))
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term")).where(
        F.col("term") != ""
    )
    nano = F.round(
        -F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
            / (F.col("t") + F.col("v") + F.lit(1))
        )
        * F.lit(1e9)
    ).cast("long")
    scored = (
        toks.join(F.broadcast(cnt), "term", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nano.alias("nano"))
    )
    avg = F.col("s") / (F.col("n_tokens") * F.lit(1e9))
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("nano").alias("s"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(avg, 6).alias("nll"),
            F.round(F.exp(avg), 4).alias("ppl"),
        )
    )


def lm_perplexity_bigram(
    docs: DataFrame, lm_docs: DataFrame | None = None
) -> DataFrame:
    """Interpolated bigram LM perplexity — the KenLM-shaped upgrade of
    ``lm_perplexity``: p(wᵢ|wᵢ₋₁) = 0.75·p_bigram_MLE + 0.25·p_unigram
    (add-one), document-initial tokens scored by the unigram alone.
    Bigram context captures local fluency the unigram can't (scrambled
    text scores near its unigram ppl but much worse under the bigram).

    Same determinism contract as the unigram: every probability is a
    chain of correctly-rounded double ops on exact integer counts,
    per-token scores are integer nano-nats, per-doc sums are integer.

    Scale shape: unigram + context tables broadcast; the BIGRAM count
    table grows toward vocab² — broadcast here (fixture-sized), but at
    web scale it becomes a shuffle join on (prev, w) and gets a top-K
    cap with the interpolation absorbing the tail, exactly as the
    vocabulary cap note on ``lm_perplexity``.

    Output: (doc_id, n_tokens, nll, ppl).
    """
    lm = lm_docs if lm_docs is not None else docs
    lam, one_m_lam = 0.75, 0.25

    def _bigrams(frame: DataFrame, with_doc: bool) -> DataFrame:
        toks = tokens("text")
        n = F.size(toks)
        pairs = bigrams(
            toks, lambda a, b: F.struct(a.alias("prev"), b.alias("w"))
        )
        cols = (["doc_id"] if with_doc else []) + [F.explode(pairs).alias("p")]
        out = frame.where(n >= 2).select(*cols)
        keep = (["doc_id"] if with_doc else []) + ["p.prev", "p.w"]
        return out.select(*keep).where(
            (F.col("w") != "") & (F.col("prev") != "")
        )

    lm_toks = lm.select(F.explode(tokens("text")).alias("term")).where(
        F.col("term") != ""
    )
    cu = lm_toks.groupBy("term").agg(F.count("*").alias("cu"))
    tot = cu.agg(F.sum("cu").alias("t"), F.count("*").alias("v"))
    cb = _bigrams(lm, with_doc=False).groupBy("prev", "w").agg(
        F.count("*").alias("cb")
    )
    ctx = cb.groupBy("prev").agg(F.sum("cb").alias("ctx"))

    p_uni = (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(1)) / (
        F.col("t") + F.col("v") + F.lit(1)
    )
    nano_of = lambda p: F.round(-F.log(p) * F.lit(1e9)).cast("long")  # noqa: E731

    # document-initial tokens: unigram only
    firsts = (
        docs.select(
            "doc_id", F.element_at(tokens("text"), 1).alias("term")
        )
        .where(F.col("term").isNotNull() & (F.col("term") != ""))
        .join(F.broadcast(cu), "term", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nano_of(p_uni).alias("nano"))
    )
    p_big = F.coalesce(
        F.col("cb") / F.col("ctx"), F.lit(0.0)
    )
    interp = F.lit(lam) * p_big + F.lit(one_m_lam) * p_uni
    rest = (
        _bigrams(docs, with_doc=True)
        .join(F.broadcast(cb), ["prev", "w"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .join(F.broadcast(cu.withColumnRenamed("term", "w")), "w", "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nano_of(interp).alias("nano"))
    )
    avg = F.col("s") / (F.col("n_tokens") * F.lit(1e9))
    return (
        firsts.unionByName(rest)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("nano").alias("s"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(avg, 6).alias("nll"),
            F.round(F.exp(avg), 4).alias("ppl"),
        )
    )


def domain_kl(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-domain distribution drift: KL(p_source ‖ p_corpus) over
    unigram token distributions — the monitoring signal for "this
    source stopped looking like the rest of the corpus" (scraper
    breakage, domain shift, injected spam).

    KL = Σ_t p_s(t)·ln(p_s(t)/q(t)) with p_s, q the source/corpus
    token frequencies. Every term that appears in a source also
    appears in the corpus, so the ratio is always finite.

    Determinism (SCALE.md house rules): the log-ratio argument is one
    correctly-rounded division of exact integer products
    (c_s·T)/(T_s·c), each per-term contribution is fixed-pointed to
    integer NANO-NATS, and the per-source total is an integer sum —
    order-free on any engine.

    Scale shape: one shuffle to (source, term) counts; the corpus
    term table (vocabulary-sized) and the two totals broadcast back.

    Output: (source, n_tokens, kl) — kl in nats, rounded to 6.
    """
    toks = docs.select(source_col, F.explode(tokens("text")).alias("term")).where(
        F.col("term") != ""
    )
    per_src = toks.groupBy(source_col, "term").agg(F.count("*").alias("cs"))
    corpus = toks.groupBy("term").agg(F.count("*").alias("c"))
    src_tot = per_src.groupBy(source_col).agg(F.sum("cs").alias("ts"))
    tot = corpus.agg(F.sum("c").alias("t"))
    contrib = F.round(
        (F.col("cs") / F.col("ts"))
        * F.log((F.col("cs") * F.col("t")) / (F.col("ts") * F.col("c")))
        * F.lit(1e9)
    ).cast("long")
    return (
        per_src.join(F.broadcast(corpus), "term")
        .join(F.broadcast(src_tot), source_col)
        .crossJoin(F.broadcast(tot))
        .select(source_col, F.col("ts"), contrib.alias("nano"))
        .groupBy(source_col)
        .agg(
            F.max("ts").alias("n_tokens"),
            F.round(F.sum("nano") / F.lit(1e9), 6).alias("kl"),
        )
    )


def langid_eval(docs: DataFrame, threshold: float = 0.05) -> DataFrame:
    """Confusion matrix of `lang_id` against the labeled ``lang``
    column — the eval pass a pipeline runs when tuning a language
    filter (which labeled languages leak through the 'en' gate).

    One scan (the heuristic is computed in the same projection as the
    label via lang_id's pass-through columns — no self-join), one
    count aggregate at |langs|×|guesses| cardinality.

    Output: (lang, lang_guess, n_docs).
    """
    return (
        lang_id(docs, threshold, keep=("lang",))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n_docs"))
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    min_lift: float = 50.0,
) -> DataFrame:
    """Collocation (fixed-phrase) mining over adjacent token bigrams:
    pairs that co-occur far more than independence predicts — the
    phrase-discovery pass behind tokenizer vocab curation and
    multi-word-entity detection.

    Association score = lift (the PMI exponent): ``n_ab · N / (n_a ·
    n_b)`` with N the corpus bigram-position count. Kept as ONE exact
    integer product per side and a single IEEE division — no log(), no
    rounding, so any SQL engine replays it bit-for-bit. ``min_count``
    guards the classic PMI rare-pair blowup; ``min_lift`` keeps only
    phrase-like pairs.

    Plan shape: one rebalanced bigram explode (the shingle pattern),
    one hash groupBy for bigram counts, one for unigram-position
    counts, a broadcast of the 1-row total; unigram counts join the
    (already aggregated, much smaller) bigram table.

    Output: (tok_a, tok_b, n_ab, lift).
    """
    from myasynstreamjoin_spark.sources.tables import rebalance

    toked = rebalance(
        docs.where(F.col("text").isNotNull()).select(tokens("text").alias("__t"))
    )
    t = F.col("__t")
    n = F.size(t)
    pairs = toked.where(n >= 2).select(
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("tok_a"),
                    F.element_at(t, i + 1).alias("tok_b"),
                ),
            )
        ).alias("bg")
    ).select("bg.tok_a", "bg.tok_b")
    big = pairs.groupBy("tok_a", "tok_b").agg(F.count("*").alias("n_ab"))
    # unigram counts over the SAME bigram positions (left slot = all
    # tokens except each doc's last; right slot = all except the first)
    ua = pairs.groupBy("tok_a").agg(F.count("*").alias("n_a"))
    ub = pairs.groupBy("tok_b").agg(F.count("*").alias("n_b"))
    total = pairs.agg(F.count("*").alias("n_tot"))
    lift = (F.col("n_ab") * F.col("n_tot")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    return (
        big.where(F.col("n_ab") >= min_count)
        .join(ua, "tok_a")
        .join(ub, "tok_b")
        .join(F.broadcast(total))
        .where(lift >= min_lift)
        .select("tok_a", "tok_b", "n_ab", lift.alias("lift"))
    )


def char_entropy(
    docs: DataFrame, kernel: str = "sql", grain: str = "micro"
) -> DataFrame:
    """Per-document character-distribution entropy — the cheap
    gibberish detector quality pipelines run beside the LM gates
    (low entropy = repeated-character junk, abnormally high = random
    noise; cf. the symbol-ratio rules of Rae et al. 2021 "Gopher"
    §A.1.1): H = Σ_c (n_c/n)·ln(n/n_c) over the normalized text's
    character histogram.

    Scale shape: one explode to character grain whose groupBy
    (doc, char) map-side-combines to ≤ |alphabet| rows per doc per
    partition, then a doc-keyed totals join and one more groupBy —
    all narrow keyed shuffles, no model, no broadcast.

    Float determinism: per-(doc, char) contributions round to integer
    NANO-NATS and sum as BIGINT (order-free; a 1-2 ulp libm ln
    disagreement moves one char type by one nano-nat); the reported
    entropy is integer-rounded to MICRO-nats and divided once —
    never round(double, 6), whose low bit differs across engines.

    Cross-engine determinism (measured round 7, closing the round-6
    advice item): across EVERY distinct (c, n) pair at sf0.001 /
    sf0.01 / sf0.1, the exact value x·1e9 sits ≥ 1e-6 nano-units from
    its rounding boundary, while the worst-case JVM-vs-libm ``ln``
    excursion is ~5e-7 — so the per-term nano integers are identical
    across engines on the driver datasets, with ≥2× margin. Given
    that, ``grain="nano"`` (the oracle-facing contract) is exactly
    deterministic END-TO-END: it reports the summed nano-nat as
    BIGINT and skips the micro re-rounding, so no rounding boundary
    of any kind remains between Spark and the oracle. The default
    ``grain="micro"`` keeps the human-friendly float for API users.

    Docs with NULL or empty normalized text are excluded (no
    characters to score — same contract as the dedup ops).

    ``kernel="arrow"`` swaps the character explode for a per-batch
    Python ``Counter`` over ``mapInPandas`` — the scale path (the
    sf3 probe put the SQL kernel at 17.8 s, all of it the one-row-per
    -character grain; the Arrow kernel is map-only with per-DOC rows).
    Integer columns are identical; the entropy float can differ by
    ≤1 micro-nat (Python vs JVM libm ``ln`` low bit — same tolerance
    contract as the SemDeDup Arrow twin). "sql" stays the default and
    carries the DuckDB oracle.

    Output: (doc_id, n_chars, n_distinct, entropy) — or with
    ``grain="nano"``: (doc_id, n_chars, n_distinct, nano_entropy
    BIGINT) = Σ round((c/n)·ln(n/c)·1e9).
    """
    if grain not in ("micro", "nano"):
        raise ValueError(f"unknown grain {grain!r}")
    if kernel == "arrow":
        if grain != "micro":
            raise ValueError("arrow kernel reports micro grain only")
        return _char_entropy_arrow(docs)
    if kernel != "sql":
        raise ValueError(f"unknown kernel {kernel!r}")
    chars = (
        docs.where(F.col("text").isNotNull())
        .select(
            "doc_id", F.explode(F.split(normalized("text"), "")).alias("ch")
        )
        .where(F.col("ch") != "")
    )
    # counts feeds two branches of one plan (totals + the join probe);
    # without a checkpoint both branches re-run the character explode
    # and its aggregation — the expensive part (SCALE.md persist-vs-
    # checkpoint rule; verified: 2 parquet scans, 0 ReusedExchange).
    counts = (
        chars.groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("n_distinct")
    )
    nano = F.round(
        (F.col("c") / F.col("n"))
        * F.log(F.col("n") / F.col("c"))
        * F.lit(1e9)
    ).cast("long")
    return (
        counts.join(totals, "doc_id")
        # n / n_distinct are constant per doc_id — grouping by them
        # rides the same shuffle as the doc key instead of re-joining
        # totals afterwards (one join, not two)
        .groupBy("doc_id", "n", "n_distinct")
        .agg(F.sum(nano).alias("s"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_chars"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("s").alias("nano_entropy")
            if grain == "nano"
            else F.expr(
                "CAST((s + 500) DIV 1000 AS DOUBLE) / 1e6"
            ).alias("entropy"),
        )
    )


def _char_entropy_arrow(docs: DataFrame) -> DataFrame:
    """Arrow twin of char_entropy: per-batch Counter, identical
    normalization (lower → strip → collapse whitespace) and identical
    nano-nat rounding (floor(x + 0.5) = HALF_UP for the non-negative
    contributions). Map-only: one row per DOCUMENT crosses the wire,
    never one per character."""

    def score(batches):
        import math
        import re
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                norm = re.sub(r"\s+", " ", text.strip().lower())
                counts = Counter(norm)
                if not counts:
                    continue
                n = sum(counts.values())
                s = sum(
                    int(math.floor((c / n) * math.log(n / c) * 1e9 + 0.5))
                    for c in counts.values()
                )
                rows.append(
                    (int(doc_id), n, len(counts), ((s + 500) // 1000) / 1e6)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chars", "n_distinct", "entropy"],
            )

    return docs.select("doc_id", "text").mapInPandas(
        score, "doc_id long, n_chars long, n_distinct long, entropy double"
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the boilerplate/templated-
    text detector production corpus filters use alongside the heuristic
    quality score (highly repetitive documents compress far below
    natural prose; near-random strings barely compress at all). Gated
    in milli-units so thresholds are integer comparisons.

    Arrow-batched ``mapInPandas`` — the codec tier, like the WARC/media
    decoders: zlib is a byte-level algorithm no SQL engine expresses,
    so this is a legitimate Python-per-blob stage, embarrassingly
    parallel, map-only (no shuffle at any corpus size). DEFLATE output
    for a fixed (input, level) is deterministic for a given zlib
    build, and the ratio is a pure size quotient — stable across runs.

    Output: (id, n_bytes, n_compressed, ratio_milli) where ratio_milli
    = n_compressed·1000 DIV n_bytes (lower = more redundant).
    """
    schema = (
        f"{id_col} long, n_bytes long, n_compressed long, ratio_milli long"
    )

    def fn(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [
                (t or "").encode("utf-8") for t in pdf[text_col].tolist()
            ]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].tolist(),
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio_milli": [
                        (c * 1000) // b if b else 0 for c, b in zip(nc, nb)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema)


def compression_gate(
    docs: DataFrame,
    lo_milli: int = 300,
    hi_milli: int = 1100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose compression ratio sits in the natural-text
    band: below ``lo_milli`` is boilerplate/templated repetition, above
    ``hi_milli`` is near-random (binary junk, encoded blobs). The
    standard Gopher-style repetition gate expressed as one semi-join
    against the map-only ratio frame."""
    keep = compression_ratio(docs, text_col=text_col, id_col=id_col).where(
        (F.col("ratio_milli") >= lo_milli)
        & (F.col("ratio_milli") <= hi_milli)
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")


# ---------------------------------------------------------------------------
# Blocklist term scanning (SQL expression kernel + Aho-Corasick twin)
# ---------------------------------------------------------------------------


def blocklist_hits(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    kernel: str = "sql",
) -> DataFrame:
    """Per-document occurrence counts for a blocklist of literal terms
    (NSFW wordlists, boilerplate markers, secret prefixes) over the
    NORMALIZED text — substring semantics, non-overlapping leftmost
    matches (``str.count``), so both kernels and the SQL oracle agree
    exactly.

    ``kernel="sql"`` (default) stays JVM-side: the term list explodes
    map-side against each doc and the count is the classic
    replace-length identity ``(len(s) − len(replace(s, t))) DIV
    len(t)`` — whole-stage codegen, zero Python, zero shuffle; the
    right kernel up to a few hundred terms (cost is O(terms·len)).

    ``kernel="arrow"`` builds an Aho-Corasick automaton once per
    partition and walks each document ONCE, so cost is O(len + hits)
    regardless of blocklist size — the 100 TB kernel for the
    10k-term wordlists real pipelines carry. Greedy per-term
    non-overlap reduction keeps its counts identical to the SQL kernel
    (pytest-pinned equality).

    Output: (doc_id, term, n_hits) — only terms that hit.
    """
    if not terms:
        raise ValueError("empty blocklist")
    if sorted(set(terms)) != sorted(terms):
        raise ValueError("duplicate blocklist terms")
    norm = normalized(text_col)
    if kernel == "sql":
        base = docs.select("doc_id", norm.alias("__norm"))
        t = F.explode(
            F.array(*[F.lit(t) for t in sorted(terms)])
        ).alias("term")
        return (
            base.select("doc_id", "__norm", t)
            .select(
                "doc_id",
                "term",
                (
                    (
                        F.length("__norm")
                        - F.length(F.replace(F.col("__norm"), F.col("term")))
                    )
                    / F.length("term")
                )
                .cast("long")
                .alias("n_hits"),
            )
            .filter(F.col("n_hits") > 0)
        )
    if kernel != "arrow":
        raise ValueError(f"unknown kernel {kernel!r}")

    import pandas as pd

    term_list = sorted(terms)

    def scan(batches):
        goto, fail, out = _aho_build(term_list)
        lens = {t: len(t) for t in term_list}
        for pdf in batches:
            rows = []
            for doc_id, s in zip(pdf["doc_id"], pdf["__norm"]):
                if s is None:
                    continue
                counts: dict[str, int] = {}
                last_end: dict[str, int] = {}
                state = 0
                for i, ch in enumerate(s):
                    while state and ch not in goto[state]:
                        state = fail[state]
                    state = goto[state].get(ch, 0)
                    for t in out[state]:
                        # greedy non-overlap per term == str.count
                        start = i + 1 - lens[t]
                        if start >= last_end.get(t, 0):
                            counts[t] = counts.get(t, 0) + 1
                            last_end[t] = i + 1
                for t, c in counts.items():
                    rows.append((doc_id, t, c))
            yield pd.DataFrame(
                rows, columns=["doc_id", "term", "n_hits"]
            )

    return docs.select("doc_id", norm.alias("__norm")).mapInPandas(
        scan, "doc_id long, term string, n_hits long"
    )


def _aho_build(terms: list[str]):
    """Aho-Corasick goto/fail/output tables (pure dicts — built once
    per partition; the automaton for a 10k-word list is ~100k nodes,
    trivially executor-resident)."""
    from collections import deque

    goto: list[dict[str, int]] = [{}]
    out: list[list[str]] = [[]]
    for t in terms:
        state = 0
        for ch in t:
            nxt = goto[state].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[state][ch] = nxt
            state = nxt
        out[state].append(t)
    fail = [0] * len(goto)
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, nxt in goto[s].items():
            q.append(nxt)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt] = out[nxt] + out[fail[nxt]]
    return goto, fail, out


def blocklist_summary(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    kernel: str = "sql",
) -> DataFrame:
    """Corpus-level blocklist report: per term, how many documents hit
    and how many total occurrences, with an exact doc_id-sum checksum
    so an oracle verifies WHICH documents matched. One groupBy on the
    (small) term key over map-only per-doc counts.

    Output: (term, n_docs, n_hits, doc_id_sum).
    """
    return (
        blocklist_hits(docs, terms, text_col, kernel)
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_hits").cast("long").alias("n_hits"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    terms: list[str],
    max_hits: int = 0,
    text_col: str = "text",
    kernel: str = "sql",
) -> DataFrame:
    """Drop documents whose total blocklist occurrences exceed
    ``max_hits`` — the gate form. Anti-join on doc_id against the
    offender set (offenders are a tiny fraction; the corpus never
    shuffles — broadcast-sized right side under AQE)."""
    offenders = (
        blocklist_hits(docs, terms, text_col, kernel)
        .groupBy("doc_id")
        .agg(F.sum("n_hits").alias("__total"))
        .filter(F.col("__total") > max_hits)
        .select("doc_id")
    )
    return docs.join(offenders, "doc_id", "left_anti")


def _mojibake(s: str) -> str:
    """What ``s`` looks like after the classic corruption: its UTF-8
    bytes mis-decoded as Windows-1252. Deriving the signature from the
    TRUE character (instead of hand-typing the garbled form) makes the
    table typo-proof — the round trip is the definition."""
    return s.encode("utf-8").decode("cp1252")


#: ftfy-lite repair table, ordered. Repair restores the ORIGINAL
#: character, except NBSP which normalizes to a plain space. Module
#: constant so the oracle SQL derives its replace chain from THESE
#: literals and can never diverge. U+201D (right double quote) is
#: absent: its third byte (0x9D) has no cp1252 mapping, so that
#: corruption cannot round-trip through a string.
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = tuple(
    (_mojibake(g), g)
    for g in ("\u2019", "\u201c", "\u2013", "\u2014",
              "\u2026", "\u00e9", "\u00e8", "\u00fc",
              "\u00f1", "\u00e7")
) + ((_mojibake("\u00a0"), " "),)


def fix_mojibake(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ftfy-lite encoding repair: undo the standard UTF-8-decoded-as-
    Latin-1 double-encoding artifacts with a FIXED, ordered replace
    table (`MOJIBAKE_MAP`) and count what was repaired — the
    deterministic core of what ftfy does heuristically, expressed so
    that an external SQL engine replays it byte-for-byte (a chained
    ``replace`` is exactly reproducible; a heuristic decoder is not).

    Per doc: ``n_fixes`` total repaired occurrences (counted per table
    entry on the intermediate text, so overlapping signatures count
    once, matching sequential application), ``n_bad_chars`` U+FFFD
    replacement characters remaining (unrepairable — the upstream
    decoder already destroyed the byte), and ``text_fixed``.

    Scale shape: map-only whole-stage-codegen string expressions —
    zero shuffle, embarrassingly parallel; the repair table is a
    compile-time constant, never a join.
    """
    c: Column = F.col(text_col)
    n_fixes: Column = F.lit(0).cast("long")
    for bad, good in MOJIBAKE_MAP:
        cnt = (
            (F.length(c) - F.length(F.replace(c, F.lit(bad), F.lit(""))))
            / F.lit(len(bad))
        ).cast("long")
        n_fixes = n_fixes + cnt
        c = F.replace(c, F.lit(bad), F.lit(good))
    bad_chars = (
        F.length(c) - F.length(F.replace(c, F.lit("�"), F.lit("")))
    ).cast("long")
    return docs.where(F.col(text_col).isNotNull()).select(
        "doc_id",
        n_fixes.alias("n_fixes"),
        bad_chars.alias("n_bad_chars"),
        c.alias("text_fixed"),
    )


def ccnet_buckets(docs: DataFrame, by: str = "source") -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): rank
    every document within its ``by`` group by unigram-LM perplexity
    (`lm_perplexity`, trained on the corpus itself) and split the group
    into head / middle / tail TERCILES — head = the lowest-perplexity
    (most LM-like) third, the slice CCNet keeps preferentially when
    budgeting pretraining data.

    The tercile rule is pure integer arithmetic on the within-group
    rank (rn·3 ≤ n → head, rn·3 ≤ 2n → middle, else tail; ranks ordered
    by the 6-decimal nll with doc_id tie-break — both reproducible by
    an external engine from the same exact integer sums), so bucket
    membership is replayable, not estimator-dependent.

    Scale shape: scoring inherits `lm_perplexity`'s one corpus shuffle
    + broadcast LM; ranking is one exchange on ``by`` plus an
    in-partition sort of NARROW doc-grain rows (doc_id, nll, n_tokens).
    A single giant group is the window-skew case: at full scale,
    compute the two boundary VALUES per group from this same ranking
    on a stratified sample and broadcast them — the integer rule makes
    the exact and sampled variants agree on everything but boundary
    ties. Output: (doc_id, by, n_tokens, ppl, bucket).
    """
    from pyspark.sql import Window

    scored = lm_perplexity(docs).join(
        docs.select("doc_id", by), "doc_id"
    )
    w = Window.partitionBy(by).orderBy("nll", "doc_id")
    n = Window.partitionBy(by)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(n))
        .select(
            "doc_id",
            by,
            "n_tokens",
            "ppl",
            F.when(F.col("__rn") * 3 <= F.col("__n"), F.lit("head"))
            .when(F.col("__rn") * 3 <= 2 * F.col("__n"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
