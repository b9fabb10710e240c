"""Gap-based sessionization: group each key's events into sessions
that close when the gap to the next event reaches ``gap`` — the
standard clickstream primitive (beyond the reference's inventory,
whose windows are all tumbling: SURVEY.md §2.6 T1).

Spark-first design: ``F.session_window`` — Catalyst's native session
aggregation (UpdatingSessions + MergingSessionsExec). ONE exchange on
the key, sessions merged sort-locally within each partition, partial
aggregation before the shuffle, and the identical call works under
Structured Streaming with a watermark (state eviction for free).
A lag()+cumsum formulation would also be one shuffle but runs TWO
sort-window passes and has no streaming analog.

Semantics: events a,b (a≤b) on the same key share a session iff
b.ts - a.ts <= gap through the chain — session_window's merge is
INCLUSIVE at the boundary (a gap of exactly ``gap`` still merges;
only a strictly larger gap starts a new session). The lag-based SQL
formulation needs ``> gap``, not ``>= gap``, as its new-session flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_us: str,
    gap: str,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Collapse ``df`` into one row per (keys, session).

    ``ts_us`` is an epoch-microseconds BIGINT column; ``gap`` is an
    interval string (e.g. ``"4 hours"``). Output: keys +
    ``session_start``/``session_end`` (epoch-µs of the first/last
    event) + ``n_events`` + any extra ``aggs``.
    """
    sw = F.session_window(F.timestamp_micros(F.col(ts_us)), gap)
    return (
        df.groupBy(*keys, sw.alias("__sw"))
        .agg(
            F.min(ts_us).alias("session_start"),
            F.max(ts_us).alias("session_end"),
            F.count("*").alias("n_events"),
            *(aggs or []),
        )
        .drop("__sw")
    )
