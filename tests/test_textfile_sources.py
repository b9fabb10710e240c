"""JSONL/CSV source round-trips (sources/textfiles.py): declared
schemas, parquet-equality after a format hop, and the PERMISSIVE
corrupt-record quarantine contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from myasynstreamjoin_spark.sources import tables
from myasynstreamjoin_spark.sources.textfiles import (
    read_documents_csv,
    read_documents_jsonl,
    write_documents_csv,
    write_documents_jsonl,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_roundtrip_equals_parquet(spark, sf_dir, tmp_path):
    docs = tables.load_table(spark, sf_dir, "documents")
    p = os.path.join(str(tmp_path), "docs_jsonl")
    write_documents_jsonl(docs, p)
    good, bad = read_documents_jsonl(spark, p)
    assert bad.count() == 0
    assert good.columns == docs.columns
    assert _sorted_rows(good) == _sorted_rows(docs)


def test_csv_roundtrip_equals_parquet(spark, sf_dir, tmp_path):
    """Full-quoting CSV survives text containing commas, quotes and
    newlines-free corpus content."""
    docs = tables.load_table(spark, sf_dir, "documents")
    p = os.path.join(str(tmp_path), "docs_csv")
    write_documents_csv(docs, p)
    good, bad = read_documents_csv(spark, p)
    assert bad.count() == 0
    assert _sorted_rows(good) == _sorted_rows(docs)


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    """A malformed line lands in the bad frame verbatim; good rows
    still parse — the one-bad-line-out-of-10^12 policy."""
    p = os.path.join(str(tmp_path), "mixed.jsonl")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write("this is not json\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", '
                '"source": "s", "n_chars": 7}\n')
    good, bad = read_documents_jsonl(spark, p)
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert [r.raw_line for r in bad.collect()] == ["this is not json"]


def test_csv_type_mismatch_quarantined(spark, tmp_path):
    """A non-numeric doc_id is a corrupt record under the declared
    schema, not a silent NULL-and-continue."""
    p = os.path.join(str(tmp_path), "mixed_csv")
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "part.csv"), "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('"1","ok","en","s","2"\n')
        f.write('"not_a_number","bad","en","s","3"\n')
    good, bad = read_documents_csv(spark, p)
    assert [r.doc_id for r in good.collect()] == [1]
    assert bad.count() == 1


def test_csv_writer_rejects_newlines(spark, tmp_path):
    """Embedded newlines can't round-trip under a multiLine-off reader
    — the writer fails fast instead of losing the row silently."""
    import os

    import pytest

    from myasynstreamjoin_spark.sources.textfiles import write_documents_csv

    docs = spark.createDataFrame(
        [(1, "line one\nline two", "en", "s", 17)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="newlines"):
        write_documents_csv(docs, os.path.join(str(tmp_path), "bad_csv"))


def test_orc_roundtrip_and_partition_pruning(spark, tmp_path):
    """ORC hive-partitioned export: a source filter opens ONLY that
    partition's directory (inputFiles), and the surviving rows round-
    trip exactly."""
    from myasynstreamjoin_spark.sources.textfiles import (
        read_documents_orc,
        write_documents_orc,
    )

    rows = [
        (1, "alpha beta", "en", "web", 10),
        (2, "gamma delta", "en", "book", 11),
        (3, "epsilon zeta", "de", "web", 12),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "orc")
    write_documents_orc(docs, path)
    got = read_documents_orc(spark, path, source="web")
    # path-based relations don't re-plan inputFiles() under a filter;
    # the executed plan's PartitionFilters entry is the pruning proof
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*source[^\]]*web[^\]]*\]", plan)
    assert m, plan
    back = sorted(
        (r["doc_id"], r["text"], r["source"]) for r in got.collect()
    )
    assert back == [(1, "alpha beta", "web"), (3, "epsilon zeta", "web")]
    # no filter → both partitions, all rows
    assert read_documents_orc(spark, path).count() == 3
