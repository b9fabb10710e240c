"""series_cosine_pairs_scaled — the dense-panel LSH scale path
(operators/timeseries.py): correctness of every emitted pair, the
guaranteed-collision recall floor for identical series, and the
max_width guard."""

from __future__ import annotations

import pytest

from myasynstreamjoin_spark.operators.timeseries import (
    series_cosine_pairs,
    series_cosine_pairs_scaled,
)

DAY_NS = 86_400_000_000_000


def _events(spark, series: dict[int, list[float]]):
    rows = [
        (u, d * DAY_NS, float(v))
        for u, vals in series.items()
        for d, v in enumerate(vals)
        if v != 0.0
    ]
    return spark.createDataFrame(rows, "user_id long, ts long, value double")


def test_scaled_pairs_are_exact_cosines_and_identical_series_always_found(spark):
    # users 1 and 2 share an IDENTICAL series (cos = 1 → identical
    # hyperplane signs → guaranteed LSH collision); 3 is scaled-copy
    # of 1 (cos = 1 as well); 4 is orthogonal-ish noise.
    series = {
        1: [5, 0, 3, 1, 0, 2],
        2: [5, 0, 3, 1, 0, 2],
        3: [10, 0, 6, 2, 0, 4],
        4: [0, 7, 0, 0, 9, 0],
    }
    ev = _events(spark, series)
    exact = {
        (r["user_a"], r["user_b"]): r["cos_sim"]
        for r in series_cosine_pairs(ev, threshold=0.99).collect()
    }
    scaled = {
        (r["user_a"], r["user_b"]): r["cos_sim"]
        for r in series_cosine_pairs_scaled(ev, threshold=0.99).collect()
    }
    # every scaled pair is a true pair (exact cosine applied in-bucket)
    assert set(scaled) <= set(exact)
    # identical/colinear series are guaranteed-recall: same vector
    # direction → same signature → same LSH bucket
    assert (1, 2) in scaled and (1, 3) in scaled and (2, 3) in scaled
    for k, v in scaled.items():
        assert abs(v - round(exact[k], 4)) <= 1e-4


def test_scaled_rejects_unbounded_width_and_handles_empty(spark):
    ev = _events(spark, {1: [1.0, 2.0]})
    with pytest.raises(ValueError, match="max_width"):
        series_cosine_pairs_scaled(ev, max_width=1)
    empty = spark.createDataFrame([], "user_id long, ts long, value double")
    assert series_cosine_pairs_scaled(empty).count() == 0
