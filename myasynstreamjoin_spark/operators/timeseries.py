"""Time-series similarity search over the event stream.

The similarity-search surface (functions/similarity.py) works on dense
stored vectors; this operator builds the vectors FROM the stream —
per-user activity series over time buckets — and finds similar users,
the streaming-data similarity-search shape (cf. "Time Series
Similarity Search for Streaming Data in Distributed Systems",
EDBT 2019; PAPERS.md).

Design: the series are SPARSE (most users are inactive in most
buckets), so cosine similarity is computed relationally — a self-join
on the bucket key (only co-active buckets pair up), a dot-product
aggregate, and per-user norms — never by materializing dense vectors.
At 100 TB this is one shuffle on bucket (hot buckets are ordinary agg
skew, AQE-handled), one on the user pair; the dense-vector alternative
is O(users × buckets) memory and a quadratic cross join.

The sparse-relational premise INVERTS when the panel is dense —
every user active in (nearly) every bucket, the shape of the sf10ish
probe corpus: the bucket join's candidate stream is then
Σ_b |active(b)|² ≈ days·users², which at 150 k users overflowed the
sandbox disk (round 7, >67 GB spill before ENOSPC). For that regime
``series_cosine_pairs_scaled`` densifies each user's series into a
fixed vector over the observed bucket range (days, not users — a
bounded width) and reuses the embeddings family's auto-scaled LSH
near-dup kernel: candidate pairs become bucket-local, verified by
exact cosine, and the plane count auto-scales with the user count.
Pick by panel density; the exact relational form remains the oracle
tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_cosine_pairs(
    events: DataFrame,
    bucket_ms: int = 86_400_000,
    threshold: float = 0.5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """User pairs whose bucketed activity series have cosine similarity
    ≥ threshold. Series = sum(value) per (user, ts-bucket); ts is
    epoch-ns (the engine's logical time model, normalized at load by
    sources.tables.normalize_epoch_ns).

    Output: (user_a, user_b, cos_sim) with user_a < user_b.
    """
    bucket = (F.col(ts_col) / F.lit(1_000_000)).cast("long") / F.lit(bucket_ms)
    s = (
        events.select(
            F.col(user_col).alias("u"),
            bucket.cast("long").alias("b"),
            F.col(value_col).alias("v"),
        )
        .groupBy("u", "b")
        .agg(F.sum("v").alias("sv"))
    )
    norms = s.groupBy("u").agg(F.sqrt(F.sum(F.col("sv") * F.col("sv"))).alias("nrm"))
    a = s.select(F.col("u").alias("user_a"), "b", F.col("sv").alias("va"))
    bb = s.select(F.col("u").alias("user_b"), "b", F.col("sv").alias("vb"))
    dots = (
        a.join(bb, "b")
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("u").alias("user_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("u").alias("user_b"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dots.join(na, "user_a")
        .join(nb, "user_b")
        .where(cos >= threshold)
        .select("user_a", "user_b", F.round(cos, 6).alias("cos_sim"))
    )


def series_cosine_pairs_scaled(
    events: DataFrame,
    bucket_ms: int = 86_400_000,
    threshold: float = 0.5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    max_width: int = 4096,
) -> DataFrame:
    """Dense-panel scale path of ``series_cosine_pairs`` (module
    docstring): densify each user's bucketed series into one
    fixed-width vector over the observed bucket range and hand the
    frame to ``embedding_neardup_pairs`` with its auto-scaled LSH
    defaults — candidate pairs are bucket-local, the exact cosine is
    applied inside each bucket, and plane count grows with the user
    count. Recall < 1 by LSH construction (identical series always
    collide — same vector, same hyperplane signs); the exact
    relational form is the verification tier, the same contract as
    the embeddings family.

    ``max_width`` guards the densification: the vector width is the
    OBSERVED bucket span (days for daily buckets — bounded by the
    panel's calendar, not its population); a span beyond it raises
    rather than materializing mega-vectors (re-bucket coarser, or
    window the panel).

    Output: (user_a, user_b, cos_sim) with user_a < user_b,
    cos_sim ≥ threshold, rounded to 4 (the embedding kernel's grain).
    """
    from myasynstreamjoin_spark.functions.similarity import (
        embedding_neardup_pairs,
    )

    bucket = (F.col(ts_col) / F.lit(1_000_000)).cast("long") / F.lit(bucket_ms)
    s = (
        events.select(
            F.col(user_col).alias("u"),
            bucket.cast("long").alias("b"),
            F.col(value_col).alias("v"),
        )
        .groupBy("u", "b")
        .agg(F.sum("v").alias("sv"))
    )
    lo, hi = s.agg(F.min("b"), F.max("b")).first()
    if lo is None:
        return events.sparkSession.createDataFrame(
            [], "user_a long, user_b long, cos_sim double"
        )
    width = int(hi - lo + 1)
    if width > max_width:
        raise ValueError(
            f"series span {width} buckets exceeds max_width={max_width}; "
            "re-bucket coarser or window the panel"
        )
    dense = (
        s.groupBy("u")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("b") - F.lit(int(lo))).cast("int").alias("k"),
                        F.col("sv").cast("double").alias("v"),
                    )
                )
            ).alias("__m")
        )
        .select(
            F.col("u").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(width - 1)),
                lambda i: F.coalesce(
                    F.element_at("__m", i.cast("int")), F.lit(0.0)
                ),
            ).alias("embedding"),
        )
    )
    pairs = embedding_neardup_pairs(
        dense, threshold=threshold, dim=width, n_planes=None
    )
    return pairs.select(
        F.col("id_a").alias("user_a"),
        F.col("id_b").alias("user_b"),
        F.col("cos").alias("cos_sim"),
    )


def event_autocorrelation(
    events: DataFrame,
    max_lag: int = 24,
    bucket_ns: int = 3_600_000_000_000,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sample autocorrelation of each event type's hourly arrival
    series — the seasonality detector (a daily cycle shows as a peak
    at lag 24) behind rate forecasting and anomaly baselines.

    The series is DENSIFIED first (missing hours are true zeros, via a
    per-type sequence explode — absent-hour-as-gap would silently
    shift every lag), then

        r_L = Σ (n·c_t − S)(n·c_{t+L} − S) / Σ (n·c_t − S)²

    with all sums over exact integers in DECIMAL(38,0) — the classic
    float mean-centering is order-dependent across engines; the
    cross-multiplied form is not. One correctly-rounded division per
    (type, lag) at the end.

    Scale shape: the series length is HOURS, not events — a year is
    8,760 points per type regardless of corpus size; the lag pairing
    is a bounded range self-join on (type, hour). The heavy work (the
    hourly count) is one map-side-combined aggregation of the raw
    stream.

    Output: (event_type, lag, acf) for 1 ≤ lag ≤ max_lag.
    """
    # integer FLOOR division (pmod-adjusted DIV): epoch-ns exceeds
    # double's 2^53 mantissa so a float detour would corrupt the hour
    # index, and bare DIV truncates toward zero while the DuckDB
    # oracles floor (`//`) — pre-1970 negative epochs would land in a
    # different bucket between engines.
    h = F.expr(
        f"({ts_col} - pmod({ts_col}, {bucket_ns})) DIV {bucket_ns}"
    )
    counts = (
        events.select(type_col, h.alias("h"))
        .groupBy(type_col, "h")
        .agg(F.count("*").alias("c"))
    )
    bounds = counts.groupBy(type_col).agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    grid = bounds.select(
        type_col, F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("h")
    )
    dense = (
        grid.join(counts, [type_col, "h"], "left")
        .select(
            type_col,
            "h",
            F.coalesce(F.col("c"), F.lit(0)).cast("decimal(38,0)").alias("c"),
        )
    )
    stats = dense.groupBy(type_col).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("c").alias("s"),
    )
    centered = dense.join(F.broadcast(stats), type_col).select(
        type_col, "h", (F.col("n") * F.col("c") - F.col("s")).alias("d")
    )
    den = centered.groupBy(type_col).agg(
        F.sum(F.col("d") * F.col("d")).alias("den")
    )
    a = centered.select(type_col, F.col("h").alias("ha"), F.col("d").alias("da"))
    b = centered.select(type_col, F.col("h").alias("hb"), F.col("d").alias("db"))
    num = (
        a.join(b, type_col)
        .where(
            (F.col("hb") > F.col("ha"))
            & (F.col("hb") <= F.col("ha") + F.lit(max_lag))
        )
        .select(
            type_col,
            (F.col("hb") - F.col("ha")).alias("lag"),
            (F.col("da") * F.col("db")).alias("p"),
        )
        .groupBy(type_col, "lag")
        .agg(F.sum("p").alias("num"))
    )
    return (
        num.join(F.broadcast(den), type_col)
        .select(
            type_col,
            "lag",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
    )


def resample_daily(
    events: DataFrame,
    ma_days: int = 7,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Calendar resampling with gap fill: per event type, one row per
    calendar day across the corpus's full [min_day, max_day] span —
    days with no events appear explicitly with count 0 — plus the
    ``ma_days``-day trailing moving average over the GAP-FILLED series.
    (Without the fill, a frame of "7 preceding rows" silently spans
    months across a gap; this is the op that makes window analytics
    honest on sparse series.)

    Plan shape: the day span is a one-row global agg broadcast into a
    generated calendar (|types| × |days| rows — a model-sized frame,
    never corpus-sized); actual daily counts left-join in; the moving
    average is a per-type window over the tiny calendar. The corpus is
    touched exactly once.

    Output: (event_type, day, n_events, ma) — day = epoch-day index,
    ma averaged over min(ma_days, days-since-start) gap-filled days.
    """
    from pyspark.sql import Window

    DAY_NS = 86_400 * 10**9
    # integer FLOOR division, not double division: epoch-ns (~1.7e18)
    # exceeds a double's 53-bit mantissa, and bare DIV truncates
    # toward zero where the oracle's `//` floors (negative-epoch rule,
    # same as the sketch day shards in operators/stats.py).
    day = F.expr(
        f"(CAST({ts_col} AS BIGINT) - pmod(CAST({ts_col} AS BIGINT),"
        f" {DAY_NS})) DIV {DAY_NS}"
    )
    daily = (
        events.select(F.col(type_col).alias("event_type"), day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_events"))
    )
    span = events.agg(
        F.min(day).alias("__d0"), F.max(day).alias("__d1")
    )
    types = events.select(F.col(type_col).alias("event_type")).distinct()
    calendar = types.join(F.broadcast(span)).select(
        "event_type",
        F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias("day"),
    )
    filled = calendar.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(ma_days - 1), 0)
    )
    return filled.select(
        "event_type", "day", "n_events", F.avg("n_events").over(w).alias("ma")
    )
