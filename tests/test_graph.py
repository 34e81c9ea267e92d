"""Tests for the graph operators (triangle counting, PageRank)."""

from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.graph import (
    PR_SCALE,
    pagerank,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ------------------------------------------------------ triangle_count


def test_triangle_single(spark):
    out = triangle_count(_edges(spark, [(1, 2), (2, 3), (1, 3)])).collect()
    assert sum(r["n_triangles"] for r in out) == 1


def test_triangle_k4_counts_four(spark):
    """K4 has exactly C(4,3) = 4 triangles, each counted once."""
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = triangle_count(_edges(spark, edges)).collect()
    assert sum(r["n_triangles"] for r in out) == 4


def test_triangle_none_on_tree(spark):
    out = triangle_count(
        _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 5)])
    ).collect()
    assert out == []


def test_triangle_ignores_direction_dupes_and_loops(spark):
    """Symmetrized duplicates, reversed edges, and self-loops collapse
    to the same simple graph."""
    messy = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (2, 2)]
    out = triangle_count(_edges(spark, messy)).collect()
    assert sum(r["n_triangles"] for r in out) == 1


def test_triangle_matches_bruteforce(spark):
    """Random-ish deterministic graph vs an O(n^3) Python count."""
    import itertools

    nodes = range(12)
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if (a * 7 + b * 13) % 3 == 0
    ]
    expect = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if ((a, b) in edges and (b, c) in edges and (a, c) in edges)
    )
    out = triangle_count(_edges(spark, edges)).collect()
    assert sum(r["n_triangles"] for r in out) == expect


# ------------------------------------------------------------ pagerank


def _pr_python(edges, iterations=8):
    """Driver-side replica of the exact integer recurrence."""
    nodes = sorted({n for e in edges for n in e[:2]})
    n = len(nodes)
    base = PR_SCALE // n
    tp = 15 * PR_SCALE // (100 * n)
    wout = {}
    for s, t, w in edges:
        wout[s] = wout.get(s, 0) + w
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        cin = {v: 0 for v in nodes}
        for s, t, w in edges:
            cin[t] += rank[s] * w // wout[s]
        rank = {v: tp + 85 * cin[v] // 100 for v in nodes}
    return rank


def test_pagerank_matches_python_replica(spark):
    edges = [
        (1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5), (2, 1, 1), (4, 1, 2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["rank_e9"] for r in pagerank(df, weight="w").collect()}
    assert got == _pr_python(edges)


def test_pagerank_sink_node_present(spark):
    """A node with no out-edges still receives rank (it appears via its
    in-edge); its outgoing mass is dropped (simplified dangling)."""
    edges = [(1, 2, 1), (2, 3, 1), (1, 3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["rank_e9"] for r in pagerank(df, weight="w").collect()}
    assert set(got) == {1, 2, 3}
    assert got == _pr_python(edges)
    # the sink (node 3, two in-edges) outranks the teleport-only node 1
    assert got[3] > got[1]


def test_pagerank_uniform_cycle_is_symmetric(spark):
    """On a symmetric cycle every node must get the identical rank."""
    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    ranks = {r["rank_e9"] for r in pagerank(df, weight="w").collect()}
    assert len(ranks) == 1


def test_pagerank_unweighted_default(spark):
    """weight=None counts each edge once — equal to explicit weight 1."""
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    df1 = spark.createDataFrame(pairs, "src long, dst long")
    df2 = spark.createDataFrame(
        [(s, t, 1) for s, t in pairs], "src long, dst long, w long"
    )
    r1 = {r["node"]: r["rank_e9"] for r in pagerank(df1).collect()}
    r2 = {r["node"]: r["rank_e9"] for r in pagerank(df2, weight="w").collect()}
    assert r1 == r2


def test_pagerank_null_weight_falls_back_to_distributed(spark):
    """A null edge weight (or a zero-sum source) is Spark-null
    territory: the local finish must decline (never crash with a
    TypeError/ZeroDivisionError) and both threshold settings must
    agree — the fallback makes the paths interchangeable on EVERY
    input, not just clean ones."""
    from pyspark.sql import types as T

    from yandex_tracker_exporter_spark.operators.graph import pagerank

    schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
            T.StructField("w", T.LongType()),
        ]
    )
    edges = [(1, 2, 3), (2, 3, None), (3, 1, 2), (1, 3, 1)]
    df = spark.createDataFrame(edges, schema)
    auto = sorted(
        tuple(r) for r in pagerank(df, weight="w", iterations=4).collect()
    )
    dist = sorted(
        tuple(r)
        for r in pagerank(
            df, weight="w", iterations=4, local_finish_edges=0
        ).collect()
    )
    assert auto == dist and auto
