"""Lexical retrieval over the document corpus: BM25 ranking and
document-frequency vocabulary/stopword analysis.

Beyond-reference surface (SURVEY.md §7 phase 5 family): the reference
engine ships word-count-style aggregation (`stateless/WordCount.scala`)
but no ranking; a training-data pipeline needs lexical retrieval for
eval-set mining, near-duplicate triage, and RAG-style chunk lookup.
Both operators here are pure DataFrame plans — tokenization, term
statistics, and scoring all stay in whole-stage codegen; no Python
runs per row.

Scale stance:
- the corpus is scanned once and exploded to (doc_id, token) pairs;
  query terms are filtered out BEFORE any shuffle (`isin` on a
  literal handful of terms), so the post-explode volume for scoring
  is |matching postings|, not |corpus tokens|;
- corpus-level constants (N, avgdl) are one-row aggregates
  crossJoin-broadcast back — never a driver collect;
- per-term document frequencies are a tiny aggregate (≤ |query|
  rows) and broadcast into the scoring join;
- top-k uses orderBy+limit, which Spark executes as
  TakeOrderedAndProject — per-partition heaps, no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k documents for a bag-of-words query.

    Uses the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` and the standard saturating
    term-frequency component. Cross-engine determinism: the per-term
    partial scores are pivoted to one COLUMN per query term and added
    in the terms' given order — a float SUM over rows would accumulate
    in engine-determined order, and float addition is non-associative,
    so a score within ~1 ulp of a round-4 boundary could rank
    differently in Spark and the oracle. With the fixed-order column
    add, every double op happens in the same sequence in both engines
    and the scores replay bit-for-bit.

    Plan shape: one corpus scan computes (doc_id, dl) and the exploded
    postings restricted to ``query_terms``; df comes from a
    countDistinct over those postings (≤ |query| rows, broadcast);
    N/avgdl from a one-row aggregate (broadcast). The final ranking is
    TakeOrderedAndProject. The corpus is never shuffled on a wide key
    — only the postings for the query's terms move.

    Output: (doc_id, score) — score rounded to 4 for cross-engine
    hash stability; ties broken by doc_id.
    """
    terms = [t.lower() for t in query_terms]
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    lens = toks.select("doc_id", F.size("toks").alias("dl"))

    postings = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    corpus = lens.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    per_term = [
        F.max(F.when(F.col("term") == t, idf * tf_part)).alias(f"__s{i}")
        for i, t in enumerate(terms)
    ]
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    scored = (
        postings.join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(*per_term)
        .select("doc_id", F.round(total, 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def vocab_stats(
    docs: DataFrame,
    top_n: int = 50,
    stopword_df_ratio: float = 0.5,
) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` terms by document frequency
    with their corpus term frequency and a stopword flag
    (df/N > ``stopword_df_ratio``) — the DF scan a pipeline runs to
    build a stopword list or prune a tokenizer vocabulary.

    Plan shape: one explode, one (term) aggregate combining
    count(=corpus tf) and countDistinct(doc_id) (=df), one one-row
    N aggregate broadcast in. Partial aggregation (map-side combine)
    keeps the shuffle at |vocab|, not |tokens|. Ranking is
    TakeOrderedAndProject on (df desc, term asc).

    Output: (term, df, tf, stopword).
    """
    exploded = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    n = docs.agg(F.count("*").alias("n_docs"))
    stats = (
        exploded.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("tf"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            "tf",
            (F.col("df").cast("double") / F.col("n_docs") > stopword_df_ratio).alias(
                "stopword"
            ),
        )
    )
    return stats.orderBy(F.col("df").desc(), F.col("term")).limit(top_n)


def log_odds_terms(
    docs: DataFrame,
    side_a_sources: Sequence[str],
    k: int = 20,
) -> DataFrame:
    """Corpus comparison: the ``k`` terms most over-represented in the
    ``side_a_sources`` slice vs the rest, by add-1-smoothed log-odds —
    the domain-drift / slice-characterization scan (Monroe et al.
    2008's "Fightin' Words" statistic, without the prior variance
    term).

    score(t) = ln((a+1)/(A−a+1)) − ln((b+1)/(B−b+1)) with a/b the
    term's token counts in each side and A/B the side totals. Counts
    are exact integers, so the doubles (and therefore the ranking)
    replay bit-for-bit in an external engine.

    Plan: one explode, per-term conditional sums in ONE aggregate
    (shuffle at |vocab|), totals re-aggregated from the per-term rows
    (no second corpus scan) and broadcast back, TakeOrdered ranking.

    Output: (term, log_odds) — rounded to 4; ties broken by term.
    """
    sides = docs.select(
        F.col("source").isin(*side_a_sources).alias("in_a"),
        F.explode(tokens("text")).alias("term"),
    )
    counts = sides.groupBy("term").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("long").alias("ta"), F.sum("b").cast("long").alias("tb")
    )
    score = F.log(
        (F.col("a") + F.lit(1.0)) / (F.col("ta") - F.col("a") + F.lit(1.0))
    ) - F.log((F.col("b") + F.lit(1.0)) / (F.col("tb") - F.col("b") + F.lit(1.0)))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select("term", F.round(score, 4).alias("log_odds"))
        .orderBy(F.col("log_odds").desc(), F.col("term"))
        .limit(k)
    )


def phrase_search(
    docs: DataFrame, phrase: str, text_col: str = "text"
) -> DataFrame:
    """Exact phrase search: documents containing the query tokens as a
    CONSECUTIVE run, with per-document occurrence counts — the match
    primitive behind quoted-query retrieval and boilerplate hunting.

    MAP-ONLY formulation: the token array is sliced into |phrase|
    shifted views, zipped (the expensive array is the zip's INPUT, per
    the SCALE.md lambda-capture rules), and each zipped row is compared
    against the constant phrase struct — one scan, zero shuffles, zero
    joins; composes with any scan-stage filter and prunes to
    (doc_id, text). The DuckDB oracle deliberately uses the OTHER
    classical formulation (positional-index self-joins), so the two
    cross-check each other. At 100 TB with a low-selectivity phrase
    workload, materialize a postings table instead and run the
    positional-join form against it.

    Output: (doc_id, n_matches), docs with ≥1 occurrence only.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    toks = tokens(text_col)
    n = F.size(toks)
    span = F.greatest(n - len(terms) + 1, F.lit(1))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, span) for j in range(len(terms))])

    # per-element equality against literal captures (cheap, scalar)
    def _eq(g):
        cond = g["0"] == F.lit(terms[0])
        for j in range(1, len(terms)):
            cond = cond & (g[str(j)] == F.lit(terms[j]))
        return cond

    matches = F.size(F.filter(zipped, _eq))
    return (
        docs.where(n >= len(terms))
        .select("doc_id", matches.alias("n_matches"))
        .where(F.col("n_matches") > 0)
    )


def hybrid_fusion_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_id: int,
    k: int = 10,
    pool: int = 10,
) -> DataFrame:
    """Hybrid retrieval: Borda (rank-sum) fusion of the lexical BM25
    top-``pool`` and the dense cosine top-``pool`` — the standard
    two-tower + keyword fusion a RAG stack runs, with the fusion kept
    INTEGER-exact (rank sums, not reciprocal-rank floats) so the fused
    ordering is engine-replayable. Items missing from one list take
    rank ``pool + 1`` (the usual truncated-list penalty).

    Scale shape: both retrievers already reduce to ≤ pool rows, so the
    fusion is a join + sort of two pool-sized frames — free next to
    the retrieval itself.

    Output: (doc_id, lex_rank, dense_rank, fused), fused ascending,
    ties by doc_id.
    """
    from pyspark.sql import Window

    from myasynstreamjoin_spark.functions.similarity import cosine_topk

    lex = bm25_topk(docs, query_terms, k=pool).withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))),
    )
    den = cosine_topk(embeddings, query_id=query_id, k=pool).select(
        F.col("vec_id").alias("doc_id"), "cos"
    ).withColumn(
        "dense_rank",
        F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("doc_id"))),
    )
    penalty = F.lit(pool + 1)
    j = lex.select("doc_id", "lex_rank").join(
        den.select("doc_id", "dense_rank"), "doc_id", "full_outer"
    )
    fused = F.coalesce("lex_rank", penalty) + F.coalesce("dense_rank", penalty)
    return (
        j.select(
            "doc_id",
            F.coalesce("lex_rank", penalty).alias("lex_rank"),
            F.coalesce("dense_rank", penalty).alias("dense_rank"),
            fused.alias("fused"),
        )
        .orderBy(F.asc("fused"), F.asc("doc_id"))
        .limit(k)
    )
