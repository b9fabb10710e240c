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


def test_negative_content_length_ends_walk_not_loops(spark):
    """A corrupt negative Content-Length must terminate the blob's
    walk (it would otherwise move pos backwards and re-parse the same
    record forever)."""
    good = _record_bytes(1, "ok")
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:doc:2>\r\n"
        b"Content-Length: -108\r\n"
        b"\r\n"
    )
    blobs = spark.createDataFrame(
        [(0, bytearray(good + bad))], "blob_id long, content binary"
    )
    out = parse_warc_blobs(blobs).collect()
    assert [r["record_id"] for r in out] == ["<urn:doc:1>"]


def test_non_urn_record_ids_yield_null_doc_id(spark):
    """Real archives use uuid record ids — warc_documents must map
    them to NULL doc_id, not die on an ANSI '' -> BIGINT cast."""
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:12af-34cd>\r\n"
        b"Content-Length: 4\r\n"
        b"\r\n"
        b"body\r\n\r\n"
    )
    blobs = spark.createDataFrame(
        [(0, bytearray(rec))], "blob_id long, content binary"
    )
    out = warc_documents(parse_warc_blobs(blobs)).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] is None and out[0]["text"] == "body"
