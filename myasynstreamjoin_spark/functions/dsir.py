"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

The standard pretraining-data selection method: score every raw
document by how much more likely its hashed n-gram features are under
a TARGET distribution (e.g. wiki-like, or one language) than under the
RAW corpus distribution, then keep the top-weighted documents. This is
the published hashed-ngram DSIR estimator — bag of unigrams+bigrams
hashed into ``n_buckets`` buckets, add-one-smoothed bucket
probabilities, importance weight = Σ_gram log(p̂_target(b)/p̂_raw(b)).

Beyond-reference surface (no analog in the reference engine; the
reference's closest op is the grouped count A3 — this composes the
same grouped counting into a selection policy).

Scale shape (100 TB):
- Both feature tables are ≤ ``n_buckets`` rows (default 4096) — they
  BROADCAST; the corpus is never shuffled to fit the model.
- Scoring is one explode → broadcast-join → per-doc sum: a single
  shuffle at (doc_id) grain with map-side partial aggregation.
- Selection is a bounded top-k (TakeOrderedAndProject — no global
  sort).

Float determinism (SCALE.md house rules): the per-bucket log-ratio is
computed from EXACT integer counts — each factor cast to double
individually (exact ≤ 2^53, correctly rounded beyond, identical in
any IEEE engine), ONE multiplication per side, ONE division, one
``ln`` — then rounded to integer NANO-NATS; per-doc sums are BIGINT
(order-independent). A worst-case 1-2 ulp libm disagreement moves a
bucket by one nano-nat, invisible at the reported 6-decimal grain.
The oracle replays the identical arithmetic in SQL (md5_32 bucketing,
same expression tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.dedup import md5_32
from myasynstreamjoin_spark.functions.text import bigrams, tokens


def _doc_gram_buckets(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, b): one row per gram OCCURRENCE (unigrams + bigrams of
    the whitespace-normalized token stream), b = md5_32(gram) mod
    n_buckets. NULL/empty texts contribute no rows — such documents are
    unscoreable and are excluded from selection (mirrored by the
    oracle)."""
    toks = tokens("text")
    unis = F.filter(toks, lambda x: x != F.lit(""))
    bis = bigrams(toks, lambda a, b: F.concat_ws(" ", a, b))
    return (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.concat(unis, bis)).alias("gram"))
        .select("doc_id", (md5_32(F.col("gram")) % n_buckets).alias("b"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document DSIR importance weights.

    ``docs`` is the raw corpus to score, ``target`` the (usually much
    smaller) sample of the distribution you want more of. Both need
    (doc_id, text). Add-one smoothing over the full bucket space keeps
    unseen buckets finite: p̂(b) = (count(b)+1)/(total+n_buckets).

    Returns (doc_id, n_grams, nano, weight): ``nano`` is the exact
    BIGINT nano-nat sum (the selection key), ``weight`` its 6-decimal
    human-readable form.
    """
    raw_b = _doc_gram_buckets(docs, n_buckets)
    tgt_b = _doc_gram_buckets(target, n_buckets)

    raw_cnt = raw_b.groupBy("b").agg(F.count("*").alias("rc"))
    tgt_cnt = tgt_b.groupBy("b").agg(F.count("*").alias("tc"))
    tots = raw_cnt.agg(F.sum("rc").alias("rtot")).crossJoin(
        tgt_cnt.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("ttot"))
    )

    # ln( ((tc+1)·(rtot+B)) / ((rc+1)·(ttot+B)) ) in nano-nats.
    # Each factor cast to double SEPARATELY so the oracle's expression
    # tree matches term for term; BIGINT products would overflow at
    # petabyte gram counts, doubles stay correctly rounded.
    B = F.lit(float(n_buckets))
    num = (
        (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1)).cast("double")
        * (F.col("rtot").cast("double") + B)
    )
    den = (
        (F.col("rc") + F.lit(1)).cast("double")
        * (F.col("ttot").cast("double") + B)
    )
    bucket_w = (
        raw_cnt.join(tgt_cnt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.round(F.log(num / den) * F.lit(1e9)).cast("long").alias("nano"),
        )
    )

    return (
        raw_b.join(F.broadcast(bucket_w), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.sum("nano").alias("nano"))
        .select(
            "doc_id",
            "n_grams",
            "nano",
            F.round(F.col("nano") / F.lit(1e9), 6).alias("weight"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int = 100,
    n_buckets: int = 4096,
) -> DataFrame:
    """Select the ``k`` raw documents whose hashed-ngram features look
    most target-like: deterministic top-k on the exact integer nano-nat
    weight (ties broken by doc_id) — a re-executed stage re-selects the
    SAME corpus. Output (doc_id, n_grams, weight)."""
    w = dsir_weights(docs, target, n_buckets)
    return (
        w.orderBy(F.col("nano").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "n_grams", "weight")
    )
