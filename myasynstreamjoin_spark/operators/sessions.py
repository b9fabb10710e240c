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

from pyspark.sql import Column, DataFrame, Window
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


def event_gaps(events: DataFrame) -> DataFrame:
    """Per-user inter-event gap statistics via lag(): the analytic-
    function complement of gap-based sessionization (same per-key
    ordered pass, one shuffle on the key). Timestamps compared at µs
    (engine-portable precision; see __spark_entry__ parity notes).

    Output: (user_id, n_gaps, avg_gap_us, max_gap_us) for users with
    ≥ 2 events.
    """
    ts_us = F.expr("ts DIV 1000")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gapped = (
        events.select("user_id", "event_id", ts_us.alias("ts_us"))
        .withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
        .where(F.col("gap").isNotNull())
    )
    # avg at µs resolution via exact integer division, NOT
    # round(avg(),4): round() on a double is tie-fragile across engines
    # (Spark rounds the shortest decimal repr, others the exact binary
    # value — observed flipping the 4th decimal at 10× SF), and double
    # accumulation order adds its own ulp noise. sum(long) DIV count is
    # exact arithmetic end to end — identical on every engine at every
    # scale.
    return gapped.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.expr("CAST(sum(gap) DIV count(*) AS LONG)").alias("avg_gap_us"),
        F.max("gap").alias("max_gap_us"),
    )


def funnel_depth(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel analysis: per user, how far through the
    ``steps`` sequence they progressed, where each step must occur
    STRICTLY AFTER the previous step's first completion (the standard
    product-analytics funnel — a purchase before any click does not
    count as depth 3).

    Relational formulation: one conditional-min aggregation per step,
    each conditioned on the previous step's timestamp carried through
    a join on the user key. #steps passes over the events table, each
    a map-side-combined aggregate joined to a |users|-row table — at
    100 TB the per-step join is broadcast-or-shuffle on the user key
    and the events scan is column-pruned to three columns; no window
    sort, no per-user collect.

    Output: (user_id, depth, t_s0, t_s1, ... ) — first-completion
    timestamps (null beyond the reached depth).
    """
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    )
    acc = e.select("user_id").distinct()
    prev_t: Column | None = None
    t_cols: list[str] = []
    for i, step in enumerate(steps):
        tname = f"t_{step}"
        cond = F.col("etype") == step
        if prev_t is not None:
            cond = cond & (F.col("ts") > prev_t)
        stage = (
            e.join(acc, "user_id")
            .groupBy("user_id", *t_cols)
            .agg(F.min(F.when(cond, F.col("ts"))).alias(tname))
        )
        acc = stage
        prev_t = F.col(tname)
        t_cols.append(tname)
    # deepest-reached step wins: each wrap puts a DEEPER step's check
    # outermost, so the final expression tests t_purchase before t_click
    # before t_view
    depth = F.lit(0)
    for i, tname in enumerate(t_cols):
        depth = F.when(F.col(tname).isNotNull(), i + 1).otherwise(depth)
    return acc.select("user_id", depth.cast("int").alias("depth"), *t_cols)


def cohort_retention(
    events: DataFrame,
    period_ns: int = 7 * 86_400_000_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: group users by their first-activity period
    (weekly by default) and report, for each (cohort, period offset),
    how many cohort members were active and the retention fraction —
    the standard growth-analytics table, the behavioral complement of
    ``funnel_depth``.

    Scale shape: first-activity is one min-aggregate per user; activity
    is a distinct projection per (user, period); both shuffle on the
    user key and the final rollup is (|cohorts| × |offsets|) rows.
    Retention is an exact-integer-operand division (deterministic
    across engines — see the event_gaps rounding note).

    Output: (cohort, offset, n_active, cohort_n, retention) where
    cohort is the first-activity period id and offset >= 0.
    """
    w = F.expr(f"CAST({ts_col} DIV {period_ns} AS LONG)")
    first = (
        events.select(F.col(user_col).alias("u"), w.alias("w"))
        .groupBy("u")
        .agg(F.min("w").alias("cohort"))
    )
    activity = events.select(
        F.col(user_col).alias("u"), w.alias("w")
    ).distinct()
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_n"))
    return (
        activity.join(first, "u")
        .select("u", "cohort", (F.col("w") - F.col("cohort")).alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count_distinct("u").alias("n_active"))
        .join(sizes, "cohort")
        .select(
            "cohort",
            "offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_n").cast("long").alias("cohort_n"),
            (
                F.col("n_active").cast("double") / F.col("cohort_n").cast("double")
            ).alias("retention"),
        )
    )


def top_event_sequences(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Sequential-pattern mining, n-gram flavor: the top-``k``
    length-``n`` consecutive event-type sequences across all users —
    the "common paths" scan behind funnel design and next-event
    features.

    Plan shape: ONE shuffle builds each user's time-ordered type array
    (collect_list + array_sort on (ts, event_id) — partial-agg
    combines map-side); the n-gram expansion is the same
    materialize-then-transform pattern as `shingle_docs` (the token
    array crosses an exchange before the gram lambda so the sort isn't
    re-evaluated per element — SCALE.md's HOF-capture rule); the gram
    count is the only other shuffle and the ranking is
    TakeOrderedAndProject. Per-user arrays are bounded by user
    activity; a pathological always-on user would need the per-group
    cap treatment (`sample_k_per_group`) upstream.

    Output: (seq, n_occurrences) — seq as 'a>b>c', ties broken by seq.
    """
    from myasynstreamjoin_spark.sources.tables import rebalance

    per_user = rebalance(
        events.groupBy("user_id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ).alias("types")
        )
    )
    sz = F.size("types")
    idx = F.sequence(F.lit(0), sz - n)
    grams = per_user.where(sz >= n).select(
        F.explode_outer(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    ">", *[F.element_at("types", i + j + 1) for j in range(n)]
                ),
            )
        ).alias("seq")
    )
    return (
        grams.groupBy("seq")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("seq"))
        .limit(k)
    )


def transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next = b | current = a) with exact bigram counts —
    the next-event-prediction baseline and the input to PageRank-style
    behavioral flow analysis.

    Plan shape: one hash shuffle partitions each user's history for the
    `lead()` window (deterministic order: (ts, event_id) tie-break);
    bigram counting is a map-side-combined groupBy on the tiny
    (from, to) domain; the per-state marginal joins back as a
    broadcast. Probabilities are a single exact long/long IEEE
    division — no round(), bit-identical across engines.

    Output: (from_type, to_type, n, p).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    pairs = nxt.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("__t"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("__t").cast("double")).alias("p"),
        )
    )


def touch_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_days: int = 7,
) -> DataFrame:
    """First- and last-touch attribution: for every conversion event,
    the earliest and the latest touch event by the same user inside the
    lookback window (touch.ts in [conv.ts − lookback, conv.ts) — same-
    instant touches are NOT credited). Conversions with no touch in
    window keep NULL attribution (they're the "dark" conversions a
    marketing report must still count).

    Plan shape: zero joins — one user-partitioned RANGE-frame window
    pass over the unified event sequence computes both ends (min/max of
    a conditional (ts, event_id, type) struct; nulls — non-touch rows —
    are ignored by min/max, and the struct ordering makes ties
    deterministic by event_id). The frame is bounded by the lookback,
    so window state is O(events per user per week), not per-user
    history. ts is epoch-ns (load boundary), so the range arithmetic
    is exact longs.

    Output: (purchase_id, user_id, first_type, first_id, last_type,
    last_id).
    """
    ns = lookback_days * 86400 * 10**9
    w = Window.partitionBy("user_id").orderBy("ts").rangeBetween(-ns, -1)
    touch = F.when(
        F.col("event_type").isin(*touch_types),
        F.struct("ts", "event_id", "event_type"),
    )
    enriched = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.min(touch).over(w).alias("__first"),
        F.max(touch).over(w).alias("__last"),
    )
    return enriched.where(F.col("event_type") == conversion).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("__first.event_type").alias("first_type"),
        F.col("__first.event_id").alias("first_id"),
        F.col("__last.event_type").alias("last_type"),
        F.col("__last.event_id").alias("last_id"),
    )


def cep_pattern(
    events: DataFrame,
    first: str = "view",
    then: str = "purchase",
    veto: str = "error",
    within_minutes: int = 60,
) -> DataFrame:
    """Complex-event-processing pattern match (MATCH_RECOGNIZE's
    bread-and-butter shape, as a DataFrame op): for every ``first``
    event, find the earliest ``then`` event by the same user strictly
    after it and within ``within_minutes``, and flag whether a ``veto``
    event strictly in between blocks the match — "view followed by
    purchase within the hour, unless an error intervened".

    Plan shape: zero joins — one user-partitioned RANGE-frame window
    (frame = (ts, ts + within]) computes both the earliest ``then``
    and the earliest ``veto`` as conditional struct minima in a single
    pass; the veto test is then a pure projection. Same bounded-state
    argument as ``touch_attribution``: window state is events-per-
    user-per-hour, not history. Same-instant events never match or
    veto (strict inequalities via the +1 ns frame start).

    Output: (first_id, user_id, then_id, blocked) — then_id NULL when
    nothing followed in time; blocked TRUE when a veto event preceded
    the matched ``then`` (NULL when there is no match at all).
    """
    ns = within_minutes * 60 * 10**9
    w = Window.partitionBy("user_id").orderBy("ts").rangeBetween(1, ns)
    pick = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.struct("ts", "event_id"))
    ).over(w)
    scored = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        pick(then).alias("__then"),
        pick(veto).alias("__veto"),
    )
    return scored.where(F.col("event_type") == first).select(
        F.col("event_id").alias("first_id"),
        "user_id",
        F.col("__then.event_id").alias("then_id"),
        F.when(
            F.col("__then").isNotNull(),
            F.col("__veto").isNotNull()
            & (F.col("__veto.ts") < F.col("__then.ts")),
        ).alias("blocked"),
    )


def debounce_events(
    events: DataFrame, min_gap_us: int = 3_600_000_000
) -> DataFrame:
    """Per-(user, event_type) DEBOUNCE, leading edge: the inactivity
    timer resets on EVERY arrival (the classic debounce contract), so
    events chain into a burst while consecutive raw gaps are
    < ``min_gap_us`` and each burst keeps exactly its FIRST event —
    the double-click/retry suppressor every event pipeline runs before
    counting anything. A continuous burst, however long, collapses to
    one event; if instead you want "at most one event per key per time
    window" regardless of burst shape, that is `throttle_events`.

    Implemented as the lag+cumsum burst assignment and a first-of-
    burst filter. ONE exchange on the key; both window passes ride the
    same partitioning. Timestamps compared at µs like `event_gaps`.

    Output: the surviving events as (user_id, event_type, event_id,
    ts_us) — downstream counts join back by event_id if they need the
    full row.
    """
    ts_us = F.expr("ts DIV 1000")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    burst = F.sum(
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) >= min_gap_us, 1
        ).otherwise(0)
    ).over(w)
    flagged = (
        events.select("user_id", "event_type", "event_id", ts_us.alias("ts_us"))
        .withColumn("__burst", burst)
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("user_id", "event_type", "__burst").orderBy(
                "ts_us", "event_id"
            )
        ))
    )
    return flagged.where(F.col("__rn") == 1).select(
        "user_id", "event_type", "event_id", "ts_us"
    )


def throttle_events(
    events: DataFrame, window_us: int = 3_600_000_000
) -> DataFrame:
    """Per-(user, event_type) RATE LIMIT: at most one event per key per
    fixed ``window_us`` time bucket (the first one) — debounce's
    fixed-clock sibling: a continuous burst spanning three buckets
    keeps three events (one per bucket) where `debounce_events` would
    keep one. Bucketing is floor(ts / window_us), so the rule is a
    pure projection; survivor election is one groupBy-free window
    ranked pass. ONE exchange on (key, bucket).

    Output: (user_id, event_type, event_id, ts_us, bucket).
    """
    ts_us = F.expr("ts DIV 1000")
    # integer DIV, never `/`+cast: ANSI `/` on longs is a DOUBLE whose
    # rounding can flip a bucket boundary that exact floor-div wouldn't
    bucket = F.expr(f"ts_us DIV {int(window_us)}")
    w = Window.partitionBy("user_id", "event_type", "bucket").orderBy(
        "ts_us", "event_id"
    )
    return (
        events.select(
            "user_id", "event_type", "event_id", ts_us.alias("ts_us")
        )
        .withColumn("bucket", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
