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
