"""Continuous end-to-end pipeline (streaming/pipeline_e2e.py): the
folded manifest must equal the batch q_pipeline_e2e answer under
ascending-doc_id batches — WARC ingest, span-index cleaning, gates,
static-bench decontamination, carried-prefix packing, and the manifest
fold all compose stream ≡ batch (module docstring has the
stage-by-stage argument)."""

from __future__ import annotations

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def test_stream_manifest_equals_batch_pipeline(spark, sf_dir):
    batch = sorted(
        tuple(r) for r in QUERIES["q_pipeline_e2e"](spark, sf_dir).collect()
    )
    streamed = sorted(
        tuple(r)
        for r in QUERIES["q_stream_pipeline_e2e"](spark, sf_dir).collect()
    )
    assert streamed == batch
    assert len(batch) > 0  # the chain must keep SOME corpus at sf0.001


def test_batch_pipeline_columns(spark, sf_dir):
    df = QUERIES["q_pipeline_e2e"](spark, sf_dir)
    assert df.columns == ["shard", "n_docs", "n_tokens", "n_seqs", "checksum"]
