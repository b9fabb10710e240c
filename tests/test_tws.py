"""transformWithState port of the stateful min-count (streaming/tws.py).

Execution needs protobuf (the API's Python state server protocol),
absent in this sandbox — so the suite always verifies that the query
PLANS correctly (analysis catches schema/timer-mode mistakes), and the
full streaming-vs-batch equivalence runs wherever protobuf exists.
"""

from __future__ import annotations

import pytest

from myasynstreamjoin_spark.config import DEFAULT_CONFIG as CFG
from myasynstreamjoin_spark.streaming.tws import tws_available, tws_min_count
from myasynstreamjoin_spark.streaming.windowed import (
    run_stream_to_table,
    stream_events,
)


def test_tws_query_plans(spark, sf_dir):
    """Analysis must succeed: grouping keys, state schema, EventTime
    timer mode, and output schema all check out at plan time."""
    df = tws_min_count(stream_events(spark, sf_dir), CFG)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["key", "ltw", "min_cnt"]
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "transformWithState" in plan or "TransformWithState" in plan


@pytest.mark.skipif(
    not tws_available(), reason="protobuf not installed (tws state server)"
)
def test_tws_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from myasynstreamjoin_spark.operators.asyn_join import min_count_per_window
    from myasynstreamjoin_spark.sources import fixtures

    got = {
        tuple(r)
        for r in run_stream_to_table(
            tws_min_count(stream_events(spark, sf_dir), CFG), spark
        ).collect()
    }
    pw = fixtures.ported_words(spark, sf_dir, CFG)
    max_ts = pw.agg(F.max("ts")).collect()[0][0]
    wm_ms = max_ts // 1_000_000 - 3_600_000
    batch = {
        tuple(r)
        for r in min_count_per_window(pw, CFG).collect()
        if (r[1] + 1) * CFG.lgw_ms <= wm_ms
    }
    assert got == batch
    assert got
