"""Triangle census: exact counts on known graphs, independence from
degree-tie orientation, and hub boundedness of the oriented adjacency."""

from __future__ import annotations

from myasynstreamjoin_spark.operators.graph import triangle_count_copurchase


def _lineitem_from_baskets(spark, baskets):
    """Build a minimal lineitem frame: order i contains the given parts."""
    rows = [
        (int(o), int(p)) for o, parts in enumerate(baskets) for p in parts
    ]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_single_triangle(spark):
    li = _lineitem_from_baskets(spark, [(1, 2, 3)])
    row = triangle_count_copurchase(li).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)
    assert row.n_wedges == 3
    assert row.closure == 1.0


def test_k4_has_four_triangles(spark):
    li = _lineitem_from_baskets(spark, [(1, 2, 3, 4)])
    row = triangle_count_copurchase(li).collect()[0]
    # K4: C(4,3)=4 triangles, 6 edges, 12 wedges, closure = 12/12 = 1
    assert (row.n_edges, row.n_wedges, row.n_triangles) == (6, 12, 4)
    assert row.closure == 1.0


def test_triangle_free_star(spark):
    # hub 1 co-purchased pairwise with leaves via 2-item baskets only:
    # star graph, no triangle
    li = _lineitem_from_baskets(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    row = triangle_count_copurchase(li).collect()[0]
    assert row.n_triangles == 0
    assert row.closure == 0.0


def test_cross_order_edges_dedup(spark):
    # the same edge appearing in many orders counts once
    li = _lineitem_from_baskets(spark, [(1, 2, 3), (1, 2), (2, 3), (1, 3)])
    row = triangle_count_copurchase(li).collect()[0]
    assert (row.n_edges, row.n_triangles) == (3, 1)


def test_two_disjoint_triangles_and_bridge_wedge(spark):
    li = _lineitem_from_baskets(spark, [(1, 2, 3), (4, 5, 6), (3, 4)])
    row = triangle_count_copurchase(li).collect()[0]
    assert row.n_triangles == 2
    assert row.n_edges == 7


def test_max_basket_excludes_megabaskets(spark):
    # a basket over the cap contributes no edges at all
    big = tuple(range(100, 200))  # 100 items > default 64 cap
    li = _lineitem_from_baskets(spark, [(1, 2, 3), big])
    row = triangle_count_copurchase(li).collect()[0]
    assert (row.n_nodes, row.n_triangles) == (3, 1)


def test_lpa_two_cliques_converge(spark):
    """Two disjoint co-purchase cliques collapse to their min-label
    communities after 3 synchronous rounds."""
    from myasynstreamjoin_spark.operators.graph import label_propagation_copurchase

    rows = []
    # order 1 buys parts 1-4 (clique A), order 2 buys parts 10-13 (B);
    # two reinforcing repeat orders each
    for ok, parts in [(1, [1, 2, 3, 4]), (3, [1, 2, 3, 4]),
                      (2, [10, 11, 12, 13]), (4, [10, 11, 12, 13])]:
        rows += [(ok, p) for p in parts]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r.part: r.community for r in label_propagation_copurchase(li).collect()}
    assert {out[p] for p in (1, 2, 3, 4)} == {1}
    assert {out[p] for p in (10, 11, 12, 13)} == {10}


def test_census_declared_zstd_session_parity(spark, sf_dir):
    """The census declares its own scale session conf
    (graph.TRIANGLE_SCALE_CONFS: zstd shuffle codec — its dominant
    shuffle is packed int arrays). Codec choice is lossless transport
    and must be invisible in results: run the registered q_triangles
    in a SUBPROCESS session built with the declared confs (static
    conf, so it needs its own JVM) and pin bit-identical output
    against the default-codec session."""
    import json
    import os
    import subprocess
    import sys

    import __spark_entry__ as contract

    want = [r.asDict() for r in contract._q_triangles(spark, sf_dir).collect()]
    script = (
        "import json, sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from myasynstreamjoin_spark.session import get_spark\n"
        "from myasynstreamjoin_spark.operators.graph import TRIANGLE_SCALE_CONFS\n"
        "import __spark_entry__ as contract\n"
        "spark = get_spark(app_name='tri-zstd', shuffle_partitions=8,"
        " extra_confs=TRIANGLE_SCALE_CONFS)\n"
        "assert spark.conf.get('spark.io.compression.codec') == 'zstd'\n"
        f"rows = contract._q_triangles(spark, {sf_dir!r}).collect()\n"
        "print('RESULT ' + json.dumps([r.asDict() for r in rows]))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = next(
        ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")
    )
    assert json.loads(line.removeprefix("RESULT ")) == want
