"""Chunking boundary semantics and latest-snapshot tiebreak."""

from __future__ import annotations

import pyspark.sql.functions as F

from myasynstreamjoin_spark.functions.pipeline import chunk_documents
from myasynstreamjoin_spark.operators.relational import latest_snapshot


def _doc(spark, n_tokens):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_chunk_boundaries(spark):
    # 10 tokens, chunk 4, overlap 1, stride 3 → chunks at 0,3,6 full and
    # a final short one at 9: ceil((10-4)/3)+1 = 3 → starts 0,3,6 cover
    # through token 9 (6+4=10) → exactly 3 chunks, no short tail.
    rows = {
        r["chunk_no"]: r
        for r in chunk_documents(
            _doc(spark, 10), chunk_size=4, overlap=1
        ).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert [rows[i]["chunk_start"] for i in (0, 1, 2)] == [1, 4, 7]
    assert [rows[i]["n_chunk_tokens"] for i in (0, 1, 2)] == [4, 4, 4]
    assert rows[0]["first_tok"] == "t0" and rows[0]["last_tok"] == "t3"
    # overlap: chunk 1 starts at the last token of chunk 0
    assert rows[1]["first_tok"] == "t3"
    assert rows[2]["last_tok"] == "t9"


def test_chunk_short_tail_and_tiny_doc(spark):
    # 11 tokens → 4th chunk is a 2-token tail (9,10)
    rows = {
        r["chunk_no"]: r
        for r in chunk_documents(
            _doc(spark, 11), chunk_size=4, overlap=1
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    assert rows[3]["n_chunk_tokens"] == 2
    assert rows[3]["first_tok"] == "t9" and rows[3]["last_tok"] == "t10"
    # doc shorter than one chunk → exactly one (short) chunk
    tiny = chunk_documents(_doc(spark, 2), chunk_size=4, overlap=1).collect()
    assert len(tiny) == 1 and tiny[0]["n_chunk_tokens"] == 2


def test_latest_snapshot_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, 100, 7, "a"),
            (1, 100, 9, "b"),   # same ts: event_id breaks the tie
            (1, 50, 99, "c"),
            (2, 10, 1, "d"),
        ],
        "user_id long, ts long, event_id long, event_type string",
    )
    got = {
        r["user_id"]: r["event_type"]
        for r in latest_snapshot(df, "user_id", ("ts", "event_id")).collect()
    }
    assert got == {1: "b", 2: "d"}


def test_histogram_integer_buckets(spark):
    """Known values: exact integer bucketing, complete coverage, and
    bucket-0/top-bucket boundary membership."""
    from myasynstreamjoin_spark.operators.relational import equi_width_histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]], "value double"
    )
    rows = {r.bucket: r for r in equi_width_histogram(df, "value", n_buckets=5).collect()}
    # span = 9001 milli-units over 5 buckets; each value falls uniquely
    assert sum(r.n for r in rows.values()) == 10
    assert min(rows) == 0 and max(rows) == 4
    # min value in bucket 0, max value in the top bucket
    assert rows[0].lo <= 0.0 < rows[0].hi
    assert rows[4].lo <= 9.0 < rows[4].hi + 1e-9


def test_histogram_single_value_column(spark):
    from myasynstreamjoin_spark.operators.relational import equi_width_histogram

    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "value double")
    rows = equi_width_histogram(df, "value", n_buckets=10).collect()
    assert len(rows) == 1 and rows[0].n == 3 and rows[0].bucket == 0


def test_autocorrelation_detects_planted_period(spark):
    """A strict period-3 arrival pattern: ACF peaks at lags 3 and 6,
    and the lag-3 value dominates every non-multiple lag."""
    from myasynstreamjoin_spark.operators.timeseries import event_autocorrelation

    H = 3_600_000_000_000
    rows = []
    eid = 0
    for h in range(60):
        burst = 10 if h % 3 == 0 else 1
        for _ in range(burst):
            rows.append((eid, h * H + 1, "a"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts long, event_type string")
    acf = {r.lag: r.acf for r in event_autocorrelation(df, max_lag=8).collect()}
    assert acf[3] > 0.8 and acf[6] > 0.8
    for lag in (1, 2, 4, 5, 7, 8):
        assert acf[lag] < acf[3] - 0.5


def test_autocorrelation_missing_hours_are_zeros(spark):
    """A type active only at hours 0 and 10 must densify the gap: the
    series has 11 points, so lags up to 10 exist."""
    from myasynstreamjoin_spark.operators.timeseries import event_autocorrelation

    H = 3_600_000_000_000
    df = spark.createDataFrame(
        [(0, 0 * H, "a"), (1, 10 * H, "a")],
        "event_id long, ts long, event_type string",
    )
    acf = {r.lag: r.acf for r in event_autocorrelation(df, max_lag=24).collect()}
    assert set(acf) == set(range(1, 11))
