"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (SURVEY.md §7 phase 5). Media payloads are
``BinaryType`` columns with a typed metadata struct; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` so each Python worker
sees columnar batches, never rows.

The container has no image/audio codecs, so the *decode* step is
stubbed: `decode_media` with `fake=False` raises NotImplementedError at
evaluation time, while `fake=True` substitutes a deterministic
byte-level "decoder" (length / first byte / checksum) that keeps the
Spark-side plumbing — schema, batch iteration, partitioning — fully
real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema: payload is opaque binary; metadata is typed.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("byte_sum_mod", T.LongType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media schema (text bytes as
    the opaque payload) — the fixture for multimodal plumbing tests."""
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        content.alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    With ``fake=True`` the decoder extracts deterministic byte-level
    features (so tests and oracles can verify the plumbing end to end).
    With ``fake=False`` it raises NotImplementedError — the container
    ships no image/audio codecs; on a real cluster this is where
    PIL/librosa/av decode the payload batch.
    """

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "first_byte": content.map(
                        lambda b: int(b[0]) if b else -1
                    ).astype("int32"),
                    "byte_sum_mod": content.map(
                        lambda b: int(sum(b) % 1_000_003) if b is not None else -1
                    ),
                }
            )

    def real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media codecs (PIL/librosa/av) are not installed in this "
            "container; run with fake=True or deploy with codec wheels"
        )

    fn = fake_decode if fake else real_decode
    return media.select("media_id", "content").mapInPandas(fn, DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled 'frame' offset
    of each payload (a video decoder would emit decoded frames; the
    fake path emits byte offsets + the byte value). Demonstrates the
    1→N mapInPandas shape with bounded batch memory.
    """
    if not fake:
        raise NotImplementedError("no video codecs in this container")

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("byte_val", T.IntegerType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame_no": [], "offset": [], "byte_val": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                for fno, off in enumerate(range(0, len(content), every_n_bytes)):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["offset"].append(off)
                    rows["byte_val"].append(int(content[off]))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(sample, out_schema)
