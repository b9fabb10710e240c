"""WARC-shaped web-archive ingestion: encode documents into
ISO-28500-style WARC record blobs and parse such blobs back into rows
— the Common-Crawl-shaped entry point of a web-scale training-data
pipeline (WARC is the format CC ships; a pipeline's first batch job is
exactly "blob of concatenated WARC records → (url, text) rows").

Spark-first shape, mirroring the multimodal module: blobs are an
opaque ``binary`` column; the record walk is pure-Python over Arrow
batches (``mapInPandas``), so each worker parses its blobs
independently — embarrassingly parallel, no shuffle, and the blob
bytes never transit as strings. The container has no real WARC
corpus, so `encode_warc_blobs` builds genuine multi-record WARC bytes
deterministically FROM the documents table; the parser is tested as a
round trip (and `q_warc_roundtrip`'s oracle is the identity SELECT on
documents — if the parse recovers anything but the input corpus, the
driver sees it).

Format notes (kept to the subset every WARC reader emits/accepts):
each record is ``WARC/1.0\\r\\n`` + headers (WARC-Type,
WARC-Record-ID, WARC-Target-URI, Content-Length) + ``\\r\\n\\r\\n`` +
body + ``\\r\\n\\r\\n``. Content-Length is the BODY byte count, the
only framing a parser may trust (bodies can contain header-looking
lines).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: records per blob — real WARC files hold thousands; small here so
#: test corpora still produce multi-record blobs.
RECORDS_PER_BLOB = 64

PARSED_SCHEMA = (
    "blob_id long, warc_type string, record_id string, "
    "target_uri string, content_length long, body string"
)


def _record_bytes(doc_id: int, text: str) -> bytes:
    body = text.encode("utf-8")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
        f"WARC-Target-URI: https://example.org/doc/{doc_id}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("ascii")
    return head + body + b"\r\n\r\n"


def encode_warc_blobs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(blob_id, content): documents packed ``RECORDS_PER_BLOB`` per
    blob in deterministic doc_id order (blob_id = doc_id DIV
    RECORDS_PER_BLOB — hash-free so the round trip is replayable).
    NULL texts are skipped (a crawl archive has no null payloads).

    The groupBy carries (id, text) pairs to one reducer per blob —
    blob size is bounded by RECORDS_PER_BLOB × document size, the
    same bound any archive writer has.
    """
    import pandas as pd  # noqa: F401  (mapInPandas worker import)

    rows = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(text_col).alias("__text"),
            # DIV, not `/`: float division then cast loses exactness
            # past 2^53 ids
            F.expr(f"CAST({id_col} AS BIGINT) DIV {RECORDS_PER_BLOB}")
            .alias("blob_id"),
        )
        .groupBy("blob_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__id", "__text"))
            ).alias("__recs")
        )
    )

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                blob = b"".join(
                    _record_bytes(int(r["__id"]), r["__text"])
                    for r in row["__recs"]
                )
                out.append({"blob_id": int(row["blob_id"]), "content": blob})
            yield pd.DataFrame(out, columns=["blob_id", "content"])

    return rows.mapInPandas(build, "blob_id long, content binary")


def parse_warc_blobs(
    blobs: DataFrame, bin_col: str = "content", id_col: str = "blob_id"
) -> DataFrame:
    """Walk each blob's concatenated WARC records into one row per
    record. Framing comes from Content-Length ONLY — bodies containing
    ``WARC/1.0`` lines parse correctly. Malformed trailing bytes end
    the blob's walk (partial final records are dropped, the standard
    tolerant-reader stance for truncated archives).
    """

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                buf = bytes(row[bin_col])
                bid = int(row[id_col])
                pos = 0
                while True:
                    if not buf.startswith(b"WARC/1.0\r\n", pos):
                        break
                    hdr_end = buf.find(b"\r\n\r\n", pos)
                    if hdr_end < 0:
                        break
                    headers = {}
                    for line in buf[pos + 10 : hdr_end].split(b"\r\n"):
                        k, _, v = line.partition(b": ")
                        headers[k.decode("ascii", "replace")] = v.decode(
                            "utf-8", "replace"
                        )
                    try:
                        clen = int(headers.get("Content-Length", ""))
                    except ValueError:
                        break
                    if clen < 0:
                        # a negative length would move pos BACKWARDS
                        # and re-parse the same record forever
                        break
                    body_start = hdr_end + 4
                    body_end = body_start + clen
                    if body_end + 4 > len(buf):
                        break
                    out.append(
                        {
                            "blob_id": bid,
                            "warc_type": headers.get("WARC-Type", ""),
                            "record_id": headers.get("WARC-Record-ID", ""),
                            "target_uri": headers.get("WARC-Target-URI", ""),
                            "content_length": clen,
                            "body": buf[body_start:body_end].decode(
                                "utf-8", "replace"
                            ),
                        }
                    )
                    pos = body_end + 4
            yield pd.DataFrame(
                out,
                columns=[
                    "blob_id",
                    "warc_type",
                    "record_id",
                    "target_uri",
                    "content_length",
                    "body",
                ],
            )

    return blobs.mapInPandas(parse, PARSED_SCHEMA)


def warc_documents(parsed: DataFrame) -> DataFrame:
    """(doc_id, text) view of parsed records — doc_id recovered from
    the record's urn, the join-ready shape downstream operators eat.
    Records whose id is not ``<urn:doc:N>`` (real archives use
    ``<urn:uuid:...>``; headerless records parse as '') get a NULL
    doc_id instead of killing the job — under ANSI mode a bare
    ``cast('' AS BIGINT)`` throws."""
    num = F.regexp_extract("record_id", r"<urn:doc:(\d+)>", 1)
    return parsed.select(
        F.when(num != "", num.cast("long")).alias("doc_id"),
        F.col("body").alias("text"),
    )
