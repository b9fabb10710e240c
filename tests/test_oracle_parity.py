"""Mirror of the driver's t2 gate: every queries() entry that declares
an oracle must match it (at sf0.001 here for speed; the driver runs
sf0.01). Entries without an oracle get a runs-and-returns-rows check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["key", "ltw", "min_cnt"]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_window_is_fully_oracle_backed():
    """The driver independently verifies registry positions 1-50; a
    rows-only query in that window would waste a slot on the weaker
    check. Rotation edits must keep the whole window oracle-backed
    and the fixed SURVEY-head stable at 1-22."""
    first50 = list(QUERIES)[:50]
    assert len(first50) == 50
    assert all(name in ORACLES for name in first50), [
        n for n in first50 if n not in ORACLES
    ]
    head = first50[:22]
    assert head[0] == "q_min_count_batch"
    assert "q_triangles" in head and "q_stream_min_count_window" in head


def test_variant_twin_handles_malformed_and_matches_from_json(spark):
    """The VARIANT path must (a) null-count malformed blobs exactly
    like the from_json path and (b) agree with it row-for-row on a
    mixed feed."""
    from myasynstreamjoin_spark.functions.json_ops import (
        props_stats,
        props_stats_variant,
    )

    rows = [
        (1, "click", '{"k": 3}'),
        (2, "click", "not json"),
        (3, "click", None),
        (4, "view", '{"k": -7}'),
        (5, "view", '{"other": 1}'),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, props string"
    )
    a = sorted(tuple(r) for r in props_stats(ev).collect())
    b = sorted(tuple(r) for r in props_stats_variant(ev).collect())
    assert a == b
    d = {r[0]: r for r in b}
    assert d["click"][2] == 2  # n_bad: malformed + NULL blob
    assert d["view"][2] == 1   # n_bad: missing field
