

def test_debounce_vs_throttle_semantics(spark):
    """A 4-event burst at t = 0, 50, 90, 130 (gap threshold 100):
    debounce (timer resets on every arrival) keeps ONLY t=0 — the
    chain 0→50→90→130 never sees a ≥100 gap — while throttle (fixed
    100-unit buckets 0 and 1) keeps t=0 and t=130. An isolated event
    at t=500 survives both."""
    import pyspark.sql.functions as F

    from myasynstreamjoin_spark.operators.sessions import (
        debounce_events,
        throttle_events,
    )

    rows = [
        (1, 7, "click", float(i), t * 1000)  # ts column is epoch-ns
        for i, t in enumerate([0, 50, 90, 130, 500])
    ]
    ev = spark.createDataFrame(
        [(i, r[4], 7, "click", 1.0, "{}") for i, r in enumerate(rows)],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    deb = sorted(r["ts_us"] for r in debounce_events(ev, min_gap_us=100).collect())
    thr = sorted(r["ts_us"] for r in throttle_events(ev, window_us=100).collect())
    assert deb == [0, 500]
    assert thr == [0, 130, 500]
