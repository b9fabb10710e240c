"""Z-order layout: interleave bit math on known values, and the
property the operator exists for — files written z-clustered cover
small rectangles of BOTH dimensions, unlike a single-column sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.operators.zorder import (
    _interleave,
    with_zvalue,
    write_zordered,
)


def test_interleave_known_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a int, b int")
    out = df.select(_interleave(F.col("a"), F.col("b"), 3).alias("z")).first()
    # a=0b101 fills even slots 0/4, b=0b011 fills odd slots 1/3 -> 0b011011
    assert out["z"] == 0b011011


def test_with_zvalue_ranges_and_determinism(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("x"), (F.col("id") % 61).alias("y")
    )
    z = with_zvalue(df, "x", "y", bits=8)
    row = z.agg(
        F.min("zv").alias("lo"), F.max("zv").alias("hi"),
        F.min("ra").alias("ralo"), F.max("ra").alias("rahi"),
    ).first()
    assert 0 <= row["lo"] and row["hi"] < (1 << 16)
    assert row["ralo"] == 0 and row["rahi"] == 255
    assert z.exceptAll(with_zvalue(df, "x", "y", bits=8)).count() == 0


def _avg_file_spans(spark, path: str, cols: tuple[str, str]) -> tuple[float, float]:
    """Mean per-file normalized (max-min)/global_range for each col."""
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    spans = df.groupBy("f").agg(
        *[x for c in cols for x in
          (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))]
    )
    glob = df.agg(*[x for c in cols for x in
                    (F.min(c).alias(f"glo_{c}"), F.max(c).alias(f"ghi_{c}"))]).first()
    out = []
    for c in cols:
        rng = glob[f"ghi_{c}"] - glob[f"glo_{c}"]
        mean = spans.agg(
            F.avg((F.col(f"hi_{c}") - F.col(f"lo_{c}")) / F.lit(float(rng)))
        ).first()[0]
        out.append(mean)
    return tuple(out)


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    df = spark.range(0, 40_000).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, "x", "y", n_files=16, bits=10)
    # baseline: range-sort by x only (the best single-column layout)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    zx, zy = _avg_file_spans(spark, zpath, ("x", "y"))
    sx, sy = _avg_file_spans(spark, spath, ("x", "y"))
    # single-column sort: x tightly clustered, y spans ~everything
    assert sx < 0.2 and sy > 0.8
    # z-order: BOTH dimensions clustered well below the full range
    assert zx < 0.5 and zy < 0.5
    # and z-order's worse dim still beats the baseline's worse dim 2x+
    assert max(zx, zy) < max(sx, sy) / 2


def test_file_skipping_stats_multi_file(spark, tmp_path):
    """Real multi-file layout: one manifest row per file, with tight
    per-file min/max (what makes skipping actionable after a
    range-clustered write)."""
    from myasynstreamjoin_spark.operators.zorder import file_skipping_stats

    df = spark.range(0, 1000).select(
        F.col("id").alias("event_id"), (F.col("id") % 100).cast("double").alias("value")
    )
    out = str(tmp_path / "t")
    # range-partitioned write → disjoint event_id ranges per file
    df.repartitionByRange(4, "event_id").write.parquet(out)
    stats = file_skipping_stats(spark, out, ["event_id"]).collect()
    assert len(stats) == 4
    assert sum(r.n_rows for r in stats) == 1000
    spans = sorted((r.min_event_id, r.max_event_id) for r in stats)
    # disjoint, ordered ranges — files are skippable on event_id
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
