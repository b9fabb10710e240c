"""WARC-shaped ingestion (sources/warc.py): Content-Length framing,
truncation tolerance, and the corpus round trip (also driver-checked
as q_warc_roundtrip against the identity oracle)."""

from __future__ import annotations

from myasynstreamjoin_spark.sources.warc import (
    _record_bytes,
    encode_warc_blobs,
    parse_warc_blobs,
    warc_documents,
)

SCHEMA = "doc_id long, text string"


def test_roundtrip_on_driver_corpus(spark, sf_dir):
    from myasynstreamjoin_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    back = warc_documents(parse_warc_blobs(encode_warc_blobs(docs)))
    a = sorted(tuple(r) for r in docs.where("text IS NOT NULL").collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_body_containing_warc_header_lines_parses_by_content_length(spark):
    docs = spark.createDataFrame(
        [(0, "WARC/1.0\r\nWARC-Type: response\r\n\r\nfake record in body")],
        SCHEMA,
    )
    parsed = parse_warc_blobs(encode_warc_blobs(docs)).collect()
    assert len(parsed) == 1
    assert parsed[0]["body"].startswith("WARC/1.0")


def test_truncated_final_record_is_dropped(spark):
    whole = _record_bytes(1, "complete record") + _record_bytes(2, "chopped")
    blobs = spark.createDataFrame(
        [(0, bytearray(whole[:-10]))], "blob_id long, content binary"
    )
    out = parse_warc_blobs(blobs).collect()
    assert [r["record_id"] for r in out] == ["<urn:doc:1>"]


def test_multirecord_blob_and_unicode_bodies(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} naïve café é中文") for i in range(5)],
        SCHEMA,
    )
    blobs = encode_warc_blobs(docs)
    assert blobs.count() == 1  # all five pack into blob 0
    out = sorted(
        tuple(r)
        for r in warc_documents(parse_warc_blobs(blobs)).collect()
    )
    assert out == sorted((i, f"doc {i} naïve café é中文") for i in range(5))
