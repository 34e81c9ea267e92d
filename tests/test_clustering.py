"""kmeans_quantized: deterministic Lloyd's over int8 codes — planted
blobs must separate, ties and empty clusters must follow the documented
rules, and the assignment must be invariant to input partitioning.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from yandex_tracker_exporter_spark.operators.clustering import (
    kmeans_quantized,
    semdedup_prune,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _vec(base, dim=64):
    return [float(base + 0.01 * j) for j in range(dim)]


def test_planted_blobs_separate(spark):
    # two tight blobs far apart; seeds (ids 0,1) land one in each
    rows = [(0, _vec(1.0)), (1, _vec(100.0))]
    rows += [(i, _vec(1.0 + 0.001 * i)) for i in range(2, 12)]
    rows += [(i, _vec(100.0 + 0.001 * i)) for i in range(12, 22)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.vec_id: r.cluster for r in kmeans_quantized(df, k=2, iters=3).collect()}
    lo = {out[i] for i in range(2, 12)} | {out[0]}
    hi = {out[i] for i in range(12, 22)} | {out[1]}
    assert lo == {0} and hi == {1}


def test_tie_breaks_to_smaller_cluster_and_empty_cluster_kept(spark):
    # seeds 0 and 2 are identical -> every zero-blob point ties between
    # cluster 0 and cluster 2 and must pick 0; cluster 2 ends empty and
    # the operator must not fail (previous centroid is kept)
    rows = [(0, _vec(1.0)), (1, _vec(50.0)), (2, _vec(1.0))]
    rows += [(i, _vec(1.0)) for i in range(3, 8)]
    df = spark.createDataFrame(rows, SCHEMA)
    res = kmeans_quantized(df, k=3, iters=2).collect()
    out = {r.vec_id: r.cluster for r in res}
    assert out[0] == 0 and out[2] == 0
    assert all(out[i] == 0 for i in range(3, 8))
    assert out[1] == 1
    assert 2 not in set(out.values())


def test_partitioning_invariance(spark):
    rows = [(i, _vec(float(i % 4) * 10.0 + 0.001 * i)) for i in range(40)]
    df1 = spark.createDataFrame(rows, SCHEMA).repartition(1)
    df8 = spark.createDataFrame(rows, SCHEMA).repartition(8)
    r1 = sorted((r.vec_id, r.cluster, r.dist2) for r in kmeans_quantized(df1, k=4, iters=3).collect())
    r8 = sorted((r.vec_id, r.cluster, r.dist2) for r in kmeans_quantized(df8, k=4, iters=3).collect())
    assert r1 == r8


def test_semdedup_drops_copy_keeps_source(spark):
    # near-orthogonal sources (spike at dim i) so no source pair crosses
    # the 0.999 threshold; each source i in 2..6 has an exact duplicate
    # at i+100 (identical codes -> always the same cluster) which must
    # be dropped while the smaller-id source is kept
    def spike(i, dim=64):
        v = [0.01] * dim
        v[i] = 10.0
        return [float(x) for x in v]

    rows = [(i, spike(i)) for i in range(0, 7)]
    rows += [(i + 100, spike(i)) for i in range(2, 7)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.vec_id: r.is_kept for r in semdedup_prune(df, k=2, iters=2, threshold=0.999).collect()}
    for i in range(2, 7):
        assert out[i] is True, f"source {i} must be kept"
        assert out[i + 100] is False, f"duplicate {i + 100} must be dropped"
    assert out[0] is True and out[1] is True


def test_too_few_vectors_rejected(spark):
    df = spark.createDataFrame([(0, _vec(1.0)), (1, _vec(2.0))], SCHEMA)
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=5, iters=1)
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=2, iters=0)


def test_assign_kernel_bitequal_expression_path(spark):
    """The Arrow assignment kernel and the aggregate(zip_with) fold must
    produce identical (cluster, dist2) through all iterations — same
    int64 L2², same first-minimum tie rule, same floor-div centroid
    evolution. Random vectors plus planted exact ties (duplicate
    vectors equidistant to two seeds must pick the smaller cluster)."""
    import random

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-2.0, 2.0) for _ in range(64)]) for i in range(120)
    ]
    # planted tie: two identical far-away vectors force equal distances
    rows += [(200, [5.0] * 64), (201, [5.0] * 64)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(
        (r.vec_id, r.cluster, r.dist2)
        for r in kmeans_quantized(df, k=6, iters=3, use_kernel=True, local_finish=False).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.dist2)
        for r in kmeans_quantized(df, k=6, iters=3, use_kernel=False, local_finish=False).collect()
    )
    assert a == b


def test_dim_inferred_and_bad_rows_quarantined(spark):
    """dim defaults to the first seed's width (32-dim corpus works
    without threading dim through semdedup), and null / wrong-width
    vectors are excluded instead of poisoning the centroid update
    with nulls (which used to TypeError on the driver)."""
    # seeds (ids 0, 1) land one in each blob, like planted-blobs above
    rows = [(0, _vec(1.0, dim=32)), (1, _vec(100.0, dim=32))]
    rows += [(i, _vec(1.0 + 0.001 * i, dim=32)) for i in range(2, 7)]
    rows += [(i, _vec(100.0 + 0.001 * i, dim=32)) for i in range(7, 12)]
    # 102: element-level null — right width, but one None inside. The
    # Arrow kernel's np.asarray(int64) would raise (task failure) while
    # the expression fold yields a null dist2: BOTH paths must see it
    # quarantined so they stay bit-equal.
    bad_elem = _vec(5.0, dim=32)
    bad_elem[3] = None
    rows += [(100, None), (101, _vec(5.0, dim=7)), (102, bad_elem)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = kmeans_quantized(df, k=2, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert set(got) == set(range(12))  # quarantined rows excluded
    assert len({got[i] for i in list(range(2, 7)) + [0]}) == 1
    assert len({got[i] for i in list(range(7, 12)) + [1]}) == 1
    assert got[0] != got[1]
    # the Arrow kernel path must quarantine the element-null row too
    # (it used to fail the whole task inside np.asarray)
    kern = kmeans_quantized(df, k=2, iters=3, use_kernel=True, local_finish=False)
    assert {r["vec_id"] for r in kern.collect()} == set(range(12))
    # semdedup inherits the inference: 32-dim corpus end-to-end
    pruned = semdedup_prune(df, k=2, iters=2, threshold=0.999)
    assert {r["vec_id"] for r in pruned.collect()} == set(range(12))


def test_all_null_vectors_rejected(spark):
    df = spark.createDataFrame([(0, None), (1, None)], SCHEMA)
    with pytest.raises(ValueError, match="no non-null vectors"):
        kmeans_quantized(df, k=1, iters=1)

def test_local_finish_bitequal_distributed_path(spark):
    """The counted-bound driver-local Lloyd finish must be byte-equal
    to the distributed expression path through all iterations — same
    seeds, same tie rule, same floor-div centroid evolution, same
    quarantine (null vector / element-null / wrong width excluded
    before the gate counts)."""
    import random

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-2.0, 2.0) for _ in range(48)]) for i in range(90)
    ]
    rows += [(200, [5.0] * 48), (201, [5.0] * 48)]  # planted tie
    bad = [0.5] * 48
    bad[7] = None
    rows += [(300, None), (301, [1.0] * 5), (302, bad)]  # quarantined
    df = spark.createDataFrame(rows, SCHEMA)
    loc = sorted(
        (r.vec_id, r.cluster, r.dist2)
        for r in kmeans_quantized(df, k=5, iters=4, local_finish=True).collect()
    )
    dist = sorted(
        (r.vec_id, r.cluster, r.dist2)
        for r in kmeans_quantized(df, k=5, iters=4, local_finish=False).collect()
    )
    assert loc == dist
    assert not any(v in {300, 301, 302} for v, _, _ in loc)
    # the default gate picks the local path for this driver-small corpus
    # and the columns/types are indistinguishable from the distributed ones
    auto = kmeans_quantized(df, k=5, iters=4)
    assert [(f.name, f.dataType.simpleString()) for f in auto.schema.fields] == [
        (f.name, f.dataType.simpleString())
        for f in kmeans_quantized(df, k=5, iters=4, local_finish=False).schema.fields
    ]
    assert sorted((r.vec_id, r.cluster, r.dist2) for r in auto.collect()) == loc
