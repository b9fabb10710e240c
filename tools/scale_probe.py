"""sf1-equivalent stress probe of the dedup/ANN family (SCALE.md).

Runs the shuffle- and explode-heavy queries against the 10×-sf0.1
corpus built by tools/make_scale_probe.py and reports, per query:
wall time, output rows, and the executor-aggregated shuffle/spill
metrics pulled from the Spark status store (the numbers SCALE.md
records). Exits non-zero on any query error.

Usage: python tools/scale_probe.py [probe_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from myasynstreamjoin_spark.session import get_spark  # noqa: E402

PROBE_DIR = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1ish"
DEFAULT = [
    "q_ngram_jaccard",
    "q_minhash_pairs",
    "q_simhash",
    "q_dedup_clusters",
    "q_embed_neardup_lsh",
    "embed_neardup_auto",
    "q_semantic_dedup",
    "semantic_dedup_auto",
    "semantic_dedup_arrow",
    "q_bloom_decontaminate",
    "q_bm25",
    "q_simsearch",
    "q_dup_spans",
    "q_copurchase",
    "q_pagerank",
    "q_event_sequences",
    "q_expectations",
    "q_stream_min_count_window",
    "q_stream_dedup",
    "q_stream_sessions",
]
NAMES = sys.argv[2:] or DEFAULT


def stage_metrics(spark):
    """Sum spill/shuffle bytes across all completed stages."""
    store = spark.sparkContext._jsc.sc().statusStore()
    spill_mem = spill_disk = sh_read = sh_write = 0
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    # Spark 4 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus) → scala Seq[StageData]
    it = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    ).iterator()
    while it.hasNext():
        s = it.next()
        spill_mem += s.memoryBytesSpilled()
        spill_disk += s.diskBytesSpilled()
        sh_read += s.shuffleReadBytes()
        sh_write += s.shuffleWriteBytes()
    return spill_mem, spill_disk, sh_read, sh_write


def _embed_neardup_auto(spark, sf_dir):
    """The scale path of q_embed_neardup_lsh: bucket-size-targeted
    auto plane count (the contract query pins 4 planes for its
    plane-literal oracle)."""
    from myasynstreamjoin_spark.functions.similarity import embedding_neardup_pairs

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(embs, threshold=0.4, n_planes=None)


def _semantic_dedup_auto(spark, sf_dir):
    """The scale path of q_semantic_dedup: √N auto-scaled seed count
    (the contract query pins 8 seeds for its literal oracle)."""
    from myasynstreamjoin_spark.functions.similarity import semantic_dedup_pairs

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup_pairs(embs, n_seeds=None, threshold=0.4)


def _semantic_dedup_arrow(spark, sf_dir):
    """Auto seeds + Arrow matmul kernels — the full 100 TB path."""
    from myasynstreamjoin_spark.functions.similarity import semantic_dedup_pairs

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup_pairs(embs, n_seeds=None, threshold=0.4, kernel="arrow")


def main() -> int:
    spark = get_spark(app_name="scale-probe")
    queries = dict(contract.queries())
    queries["embed_neardup_auto"] = _embed_neardup_auto
    queries["semantic_dedup_auto"] = _semantic_dedup_auto
    queries["semantic_dedup_arrow"] = _semantic_dedup_arrow
    failures = 0
    base = stage_metrics(spark)
    for name in NAMES:
        t0 = time.perf_counter()
        try:
            n = queries[name](spark, PROBE_DIR).count()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAIL {type(exc).__name__}: {exc}")
            failures += 1
            continue
        wall = time.perf_counter() - t0
        cur = stage_metrics(spark)
        delta = [c - b for c, b in zip(cur, base)]
        base = cur
        print(
            f"{name}: {wall:.1f}s rows={n} "
            f"spill_mem={delta[0]/2**20:.0f}MiB spill_disk={delta[1]/2**20:.0f}MiB "
            f"shuffle_r={delta[2]/2**20:.0f}MiB shuffle_w={delta[3]/2**20:.0f}MiB"
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
