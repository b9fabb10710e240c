"""Property-based tests (hypothesis): invariants that must hold for
arbitrary inputs, not just the driver fixtures.

Spark-session-per-example would be prohibitively slow, so each property
generates a full small dataset per example and runs a handful of
examples against the shared session (deadline disabled; Spark job
latency dominates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from myasynstreamjoin_spark.operators.skew import salted_agg, split_skew_agg
from myasynstreamjoin_spark.sources.fixtures import (
    decode_packed_lines,
    encode_packed_lines,
)

# Keys from the reference's demo key space plus awkward-but-legal words
# (the grammar is space/semicolon-delimited, so keys exclude both).
KEY = st.sampled_from(["A", "B", "C", "D", "E", "F", "zipf_head", "x1"])
ROW = st.tuples(
    st.integers(min_value=0, max_value=2**40),  # ts
    st.integers(min_value=0, max_value=2),      # source
    KEY,
)
ROWS = st.lists(ROW, min_size=1, max_size=60)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(rows=ROWS)
@PROP_SETTINGS
def test_packed_codec_round_trips(spark, rows):
    """encode(decode) is the identity on (ts, source, key) multisets —
    the reference's Kafka text grammar (P1/P2) loses nothing."""
    df = spark.createDataFrame(rows, "ts long, source int, key string")
    back = decode_packed_lines(encode_packed_lines(df, pack_by="source"))
    assert sorted(map(tuple, back.collect())) == sorted(rows)


@given(rows=ROWS, fanout=st.sampled_from([2, 4, 16]))
@PROP_SETTINGS
def test_salted_agg_equals_plain_agg(spark, rows, fanout):
    """Salting (PKG/X4) is a pure physical rewrite: counts per key are
    identical to the direct groupBy for any data and any fan-out."""
    df = spark.createDataFrame(rows, "ts long, source int, key string")
    plain = {(r["key"], r["cnt"]) for r in df.groupBy("key").agg(
        F.count("*").alias("cnt")).collect()}
    salted = {(r["key"], r["cnt"]) for r in salted_agg(
        df, ["key"], {"cnt": ("count", "*")}, fanout=fanout).collect()}
    assert salted == plain


@given(rows=ROWS)
@PROP_SETTINGS
def test_split_skew_agg_equals_plain_agg(spark, rows):
    """Heavy-only salting (APK/X7) is likewise semantics-preserving,
    whatever the actual skew of the data."""
    df = spark.createDataFrame(rows, "ts long, source int, key string")
    plain = {(r["key"], r["cnt"]) for r in df.groupBy("key").agg(
        F.count("*").alias("cnt")).collect()}
    got = {(r["key"], r["cnt"]) for r in split_skew_agg(
        df, ["key"], {"cnt": ("count", "*")}, fanout=8).collect()}
    assert got == plain


def test_reference_config_window_width(spark):
    """The literal reference configuration (1000 ms logic slots,
    stream.json:10) must flow through the window-assignment path: the
    rescaled 1 h default is a fixture choice, not a hardcode."""
    from pyspark.sql import functions as F

    from myasynstreamjoin_spark.config import REFERENCE_CONFIG
    from myasynstreamjoin_spark.sources.fixtures import with_window

    assert REFERENCE_CONFIG.lgw_ms == 1000
    df = spark.createDataFrame(
        [(999_999_999, "a"), (1_000_000_000, "b"), (2_500_000_000, "c")],
        "ts long, key string",
    )
    got = {
        (r["key"], r["ltw"])
        for r in with_window(df, REFERENCE_CONFIG).collect()
    }
    # 1000 ms = 1e9 ns per window: 0.999… s → window 0, 1 s → 1, 2.5 s → 2
    assert got == {("a", 0), ("b", 1), ("c", 2)}
