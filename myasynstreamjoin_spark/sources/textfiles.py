"""JSONL / CSV ingestion with locked schemas and explicit bad-record
policy — the "files from elsewhere" source formats a production
pipeline ingests alongside parquet.

House rules this module encodes (each is a scale lesson):

- **Schemas are DECLARED, never inferred.** Inference costs an extra
  full scan of 100 TB before the real one, and its result can drift
  between days of data (a column of digits infers INT until the day a
  value overflows). Every reader here takes the documents schema from
  one place.
- **Corrupt records are data, not exceptions.** PERMISSIVE mode with a
  captured ``_corrupt_record`` column lets one bad line out of 10¹²
  flow to a quarantine sink instead of killing a 6-hour job —
  FAILFAST is for CI, not production. Readers return (good, bad)
  frames so callers must decide, not forget.
- **multiLine stays off.** Single-line JSON objects are splittable —
  Spark assigns file ranges to tasks; a multiLine JSON file is one
  task however big it is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The documents table's declared logical schema (FIXTURES.md) — the
#: single source of truth for the text readers.
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType(), True)]
    )


def _split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad) from a PERMISSIVE-parsed frame. Spark disallows
    queries touching ONLY the corrupt column of a raw text relation
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the supported contract is to
    materialize the parsed frame first. An eager localCheckpoint does
    that ONCE and, unlike .cache(), holds no storage-memory pin for
    the session's lifetime (a long-lived ingest session calling the
    reader per batch would otherwise accumulate unreleasable cached
    relations)."""
    raw = raw.localCheckpoint(eager=True)
    good = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """One JSON object per line (splittable), gzip off for local tests
    (on a cluster prefer zstd — gzip is not splittable)."""
    docs.write.mode("overwrite").json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL documents with the declared schema.

    Returns (good, bad): ``good`` matches DOCUMENTS_SCHEMA; ``bad``
    carries the raw corrupt lines (one column) for quarantine.
    """
    raw = (
        spark.read.schema(_with_corrupt(DOCUMENTS_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return _split_corrupt(raw)


def write_documents_csv(
    docs: DataFrame, path: str, validate: bool = True
) -> None:
    """CSV with header and full quoting — text contains whatever it
    contains; the reader must not depend on content being comma-free.

    Newlines are REJECTED, not written: the reader keeps ``multiLine``
    off (a multiLine CSV file is one unsplittable task), and a quoted
    embedded newline under that reader splits the row into two corrupt
    records — silent data loss. Fail at write time instead and point
    the producer at JSONL, which escapes newlines natively.
    ``validate=False`` skips the guard scan when the caller has
    already sanitized (the guard is one aggregation pass).
    """
    if validate:
        n_bad = docs.where(F.col("text").rlike("[\n\r]")).limit(1).count()
        if n_bad:
            raise ValueError(
                "text contains newlines — CSV with multiLine off cannot "
                "round-trip them; write JSONL instead or scrub first"
            )
    (
        docs.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )


def read_documents_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read CSV documents with the declared schema; same (good, bad)
    contract as the JSONL reader."""
    raw = (
        spark.read.schema(_with_corrupt(DOCUMENTS_SCHEMA))
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return _split_corrupt(raw)


def write_documents_orc(
    docs: DataFrame, path: str, partition_by: str = "source"
) -> None:
    """Hive-partitioned ORC export — the second columnar interchange
    format next to parquet (Avro stays environment-gated like Kafka:
    its external module jar is not in this sandbox and there is no
    network; ORC support is built into Spark core). Partitioning by a
    low-cardinality column makes the partition value a DIRECTORY, so
    a reader filtering on it opens only that directory's files —
    verified via the executed plan's PartitionFilters in
    tests/test_textfile_sources.py."""
    docs.write.mode("overwrite").partitionBy(partition_by).orc(path)


def read_documents_orc(
    spark: SparkSession, path: str, source: str | None = None
) -> DataFrame:
    """Read the ORC export back; ``source`` pushes a partition filter
    (directory pruning — unmatched partitions' files never open)."""
    df = spark.read.orc(path)
    if source is not None:
        df = df.where(F.col("source") == source)
    return df
