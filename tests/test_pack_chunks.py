"""pack_chunks (functions/pipeline.py): the sample materializer on top
of pack_sequences' assignment. Oracle parity is covered by
test_oracle_parity (q_pack_chunks); these pin the packing semantics."""

from __future__ import annotations

from myasynstreamjoin_spark.functions.pipeline import (
    pack_chunks,
    pack_sequences,
)
from pyspark.sql import functions as F


def _docs(spark, n=10, toks=7):
    return spark.createDataFrame(
        [(i, " ".join(f"d{i}t{j}" for j in range(toks))) for i in range(n)],
        "doc_id long, text string",
    )


def test_every_sample_is_exactly_budget_tokens(spark):
    out = pack_chunks(_docs(spark), budget=16, n_shards=2).collect()
    assert out and all(len(r["tokens"]) == 16 for r in out)


def test_tokens_concatenate_in_doc_id_order_within_shard(spark):
    """Within a shard, the concatenation of all samples (by seq_id)
    must be a prefix of the docs' tokens laid head-to-tail in id
    order — the exact contract pack_sequences assigns."""
    docs = _docs(spark)
    from myasynstreamjoin_spark.functions.text import tokens as _tokens

    by_shard = {}
    assign = pack_sequences(
        docs.select("doc_id", _tokens("text").alias("__t"), "text"),
        F.size("__t"), budget=16, n_shards=2,
    ).collect()
    toks = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    for r in sorted(assign, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).extend(toks[r["doc_id"]])
    out = pack_chunks(docs, budget=16, n_shards=2).collect()
    for shard in {r["shard"] for r in out}:
        got = []
        for r in sorted(
            (r for r in out if r["shard"] == shard),
            key=lambda r: r["seq_id"],
        ):
            got.extend(r["tokens"])
        assert got == by_shard[shard][: len(got)]
        # the dropped tail is shorter than one budget
        assert len(by_shard[shard]) - len(got) < 16


def test_partial_trailing_sequence_dropped(spark):
    # one shard, 3 docs x 7 tokens = 21 tokens, budget 16 -> exactly
    # one full sample, 5 tokens of waste
    docs = _docs(spark, n=3)
    out = pack_chunks(docs, budget=16, n_shards=1).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 3  # sample crosses all three docs


def test_pack_token_ids_packs_real_ids_in_order(spark):
    """The BPE-ids twin: every sample is exactly budget ids, and per
    shard the sample concatenation is a prefix of the docs' token_ids
    laid head-to-tail in id order."""
    from myasynstreamjoin_spark.functions.pipeline import pack_token_ids

    enc = spark.createDataFrame(
        [(i, [i * 100 + j for j in range(7)]) for i in range(10)],
        "doc_id long, token_ids array<int>",
    )
    out = pack_token_ids(enc, budget=16, n_shards=2).collect()
    assert out and all(len(r["tokens"]) == 16 for r in out)
    ids = {r["doc_id"]: list(r["token_ids"]) for r in enc.collect()}
    assign = pack_sequences(
        enc.select("doc_id", F.size("token_ids").alias("n")),
        "n", budget=16, n_shards=2,
    ).collect()
    stream: dict[int, list[int]] = {}
    for r in sorted(assign, key=lambda r: (r["shard"], r["doc_id"])):
        stream.setdefault(r["shard"], []).extend(ids[r["doc_id"]])
    for shard in stream:
        samples = sorted(
            (r for r in out if r["shard"] == shard), key=lambda r: r["seq_id"]
        )
        flat = [t for r in samples for t in r["tokens"]]
        assert flat == stream[shard][: len(flat)]
        # only the trailing partial sequence is unpacked
        assert len(stream[shard]) - len(flat) < 16
