"""Round-9 operator-surface review, part 2: latent-input shapes
through the GRAPH family (the dedup/similarity → funnel probe pattern
applied to the next unprobed family). Contract fixtures derive edges
from TPC-H joins and never produce NULL endpoints — every fix is
pinned result-neutral by the manifest sweep — so these tests keep the
library surface honest for real edge lists.

Bug classes this probe found and fixed:

- a NULL src/dst survived pagerank's node-set ``distinct()`` and
  INFLATED n_nodes: base and teleport both divide by N, so ONE junk
  edge changed EVERY real node's rank (measured 111124608 → 74083072
  on a 4-node graph) and a NULL node was emitted with teleport rank;
- a null-WEIGHT edge half-participated: its endpoints entered the
  node set (shifting every rank) while its mass flow was null-skipped
  — and a NaN weight silently cast to 0 instead of being rejected;
- a NULL id in a near-dup pair CRASHED duplicate_clusters' local
  union-find finish (None is unorderable in Python 3) while the
  distributed min-label loop emitted a NULL node and kept the junk
  pair's real endpoint as a singleton — a divergence between two
  paths documented (and elsewhere twin-tested) as byte-equal.

Fix posture = the asof-join rule extended to graphs: an edge with a
NULL endpoint (or, when weighted, a NULL/NaN weight) has fewer than
two usable ends and cannot participate at all.  triangle_count /
kcore / degree_assortativity_moments already dropped such edges
through their self-loop filters (least/greatest collapse a one-null
edge into a self-loop; the a != b predicate is null-rejecting) — those
are PINNED here, not fixed.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yandex_tracker_exporter_spark.operators.dedup import duplicate_clusters
from yandex_tracker_exporter_spark.operators.graph import (
    degree_assortativity_moments,
    kcore,
    pagerank,
    triangle_count,
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("w", T.LongType()),
    ]
)

CLEAN = [(1, 2, 1), (2, 3, 1), (3, 1, 1), (3, 4, 1)]
#: junk shapes: one-null, other-null, both-null endpoints.  5 appears
#: ONLY on junk edges, so it must not appear in any output.
JUNK = [(None, 5, 1), (5, None, 1), (None, None, 1)]


def _edges(spark, rows, schema=EDGE_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- pagerank


@pytest.mark.parametrize("local_finish", [100_000, 0])
def test_pagerank_null_edges_do_not_move_real_ranks(spark, local_finish):
    clean = pagerank(
        _edges(spark, CLEAN), weight="w", iterations=4,
        local_finish_edges=local_finish,
    )
    dirty = pagerank(
        _edges(spark, CLEAN + JUNK), weight="w", iterations=4,
        local_finish_edges=local_finish,
    )
    assert _rows(dirty) == _rows(clean)  # no NULL node, no rank shift


@pytest.mark.parametrize("local_finish", [100_000, 0])
def test_pagerank_null_weight_edge_cannot_participate(spark, local_finish):
    # (4, 5, NULL): unknown weight — the edge is dropped entirely, so
    # node 5 (whose only edge it is) must not enter the node set.
    dirty = pagerank(
        _edges(spark, CLEAN + [(4, 5, None)]), weight="w", iterations=4,
        local_finish_edges=local_finish,
    )
    clean = pagerank(
        _edges(spark, CLEAN), weight="w", iterations=4,
        local_finish_edges=local_finish,
    )
    assert _rows(dirty) == _rows(clean)


def test_pagerank_nan_weight_edge_dropped(spark):
    # NaN cast to long is 0 under non-ANSI — without the isnan guard
    # the junk edge would enter the node set with zero mass flow.
    schema = T.StructType(
        [
            T.StructField("src", T.LongType()),
            T.StructField("dst", T.LongType()),
            T.StructField("w", T.DoubleType()),
        ]
    )
    clean_rows = [(s, t, float(w)) for s, t, w in CLEAN]
    dirty = pagerank(
        _edges(spark, clean_rows + [(4, 5, float("nan"))], schema),
        weight="w", iterations=4,
    )
    clean = pagerank(_edges(spark, clean_rows, schema), weight="w", iterations=4)
    assert _rows(dirty) == _rows(clean)


def test_pagerank_unweighted_null_endpoints_dropped(spark):
    # weight=None path: only the endpoint guard applies
    clean = pagerank(_edges(spark, CLEAN), iterations=4)
    dirty = pagerank(_edges(spark, CLEAN + JUNK), iterations=4)
    assert _rows(dirty) == _rows(clean)


# ---------------------------------------------------- duplicate_clusters

PAIR_SCHEMA = T.StructType(
    [T.StructField("a_id", T.LongType()), T.StructField("b_id", T.LongType())]
)
PAIRS_CLEAN = [(1, 2), (2, 3), (10, 11)]
PAIRS_JUNK = [(None, 4), (5, None), (None, None)]


@pytest.mark.parametrize("local_finish", [100_000, 0])
def test_duplicate_clusters_null_ids_cannot_participate(spark, local_finish):
    clean = duplicate_clusters(
        spark.createDataFrame(PAIRS_CLEAN, PAIR_SCHEMA),
        local_finish_edges=local_finish,
    )
    # used to CRASH the local path (None unorderable) and emit a NULL
    # node + junk singletons (4, 5) on the distributed path
    dirty = duplicate_clusters(
        spark.createDataFrame(PAIRS_CLEAN + PAIRS_JUNK, PAIR_SCHEMA),
        local_finish_edges=local_finish,
    )
    assert _rows(dirty) == _rows(clean)


def test_duplicate_clusters_null_ids_string_keys(spark):
    schema = T.StructType(
        [T.StructField("a_id", T.StringType()), T.StructField("b_id", T.StringType())]
    )
    clean = duplicate_clusters(
        spark.createDataFrame([("a", "b"), ("b", "c")], schema)
    )
    dirty = duplicate_clusters(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), (None, "d"), ("e", None)], schema
        )
    )
    assert _rows(dirty) == _rows(clean)


# --------------------------------- pins: operators that already drop junk


def test_triangle_count_null_edges_inert(spark):
    clean = triangle_count(_edges(spark, CLEAN).select("src", "dst"))
    dirty = triangle_count(_edges(spark, CLEAN + JUNK).select("src", "dst"))
    assert _rows(dirty) == _rows(clean) == [(1, 1)]


def test_kcore_null_edges_inert(spark):
    clean = kcore(_edges(spark, CLEAN).select("src", "dst"), k=2)
    dirty = kcore(_edges(spark, CLEAN + JUNK).select("src", "dst"), k=2)
    assert _rows(dirty) == _rows(clean) == [(1, 2), (2, 2), (3, 2)]


def test_assortativity_null_edges_inert(spark):
    clean = degree_assortativity_moments(_edges(spark, CLEAN).select("src", "dst"))
    dirty = degree_assortativity_moments(
        _edges(spark, CLEAN + JUNK).select("src", "dst")
    )
    assert _rows(dirty) == _rows(clean)
