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
