"""Unit tests for k-core peeling, SCD2 intervals, resetting running
totals, and the one-pass table profile."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from yandex_tracker_exporter_spark.operators.graph import kcore
from yandex_tracker_exporter_spark.operators.profile import profile_table
from yandex_tracker_exporter_spark.operators.temporal import (
    SCD2_OPEN_END,
    reset_running_total,
    scd2_intervals,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def test_kcore_triangle_plus_tail(spark):
    """A triangle with a pendant path: the 2-core is exactly the
    triangle (the tail peels away over two rounds)."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["core_deg"] for r in kcore(df, k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_when_k_too_large(spark):
    edges = [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert kcore(df, k=3, rounds=3).count() == 0


def _peel_ref(pairs, k):
    """Brute-force synchronous peeler over a driver-side edge list —
    deliberately not engine-shaped (dict degree counting, set peel)."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    alive = {n for e in edges for n in e}
    while True:
        deg: dict = {}
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        nxt = {n for n, d in deg.items() if d >= k}
        if nxt == alive:
            return {n: deg[n] for n in alive}
        alive = nxt


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_kcore_contract_is_true_fixpoint(spark, sf):
    """Round-7 promotion: the kcore_3 CONTRACT is the operator's
    true-fixpoint default (no more 8-round-superset caveat). Verified
    differentially at ALL THREE scales against a brute-force Python
    peeler over the collected co-purchase edge list — the sf0.01/sf0.1
    graphs peel deeper than the old 8-round unroll, so this pins
    exactly the semantics the old contract approximated."""
    import __spark_entry__ as entry_mod

    edges_df = entry_mod._copurchase_edges(spark, f"/root/testdata/sf{sf}")
    pairs = [(r[0], r[1]) for r in edges_df.collect()]
    got = {r["node"]: r["core_deg"] for r in kcore(edges_df, k=3).collect()}
    assert got == _peel_ref(pairs, 3)


def test_kcore_deep_peeling_reaches_true_fixpoint(spark):
    """ADVICE r4 regression: a long path needs ~n/2 peeling rounds (the
    two endpoints fall off each round), more than the old fixed 8-round
    unroll — which would have returned the surviving middle as a FALSE
    2-core. The default cap + early exit must peel it to empty."""
    n = 24
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert kcore(df, k=2).count() == 0
    # and a ring (a true 2-core) attached to a long tail keeps exactly
    # the ring, however deep the tail peeling runs
    ring = [(100, 101), (101, 102), (102, 100)]
    tail = [(102, 200)] + [(200 + i, 201 + i) for i in range(20)]
    df2 = spark.createDataFrame(ring + tail, ["src", "dst"])
    out = {r["node"] for r in kcore(df2, k=2).collect()}
    assert out == {100, 101, 102}


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


def test_scd2_runs_and_intervals(spark):
    """Value runs collapse; intervals chain [from, to); the open run
    carries the sentinel and is_current."""
    rows = [
        (7, 1, _ts(0), '{"k": 10}'),
        (7, 2, _ts(1), '{"k": 10}'),   # same run
        (7, 3, _ts(2), '{"k": 20}'),   # change
        (7, 4, _ts(3), '{"k": 10}'),   # change back
        (8, 5, _ts(0), '{"k": 5}'),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "props"])
    out = sorted(
        (
            (r["entity"], r["value"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_intervals(df).collect()
        )
    )
    e = lambda h: int(_ts(h).replace(tzinfo=dt.timezone.utc).timestamp())
    assert out == [
        (7, 10, e(0), e(2), 0),
        (7, 10, e(3), SCD2_OPEN_END, 1),
        (7, 20, e(2), e(3), 0),
        (8, 5, e(0), SCD2_OPEN_END, 1),
    ]


def test_scd2_value_type_validated_and_accepts_datatype(spark):
    """ADVICE r10: value_type is interpolated into SQL text, so it must
    be validated — a DataType object (accepted by the old .cast())
    normalizes via simpleString(), a type NAME round-trips through
    Spark's DDL parser, and garbage fails loudly as a ValueError
    instead of broken SQL deep inside the window chain."""
    import pytest
    from pyspark.sql.types import StringType

    rows = [(7, 1, _ts(0), '{"k": 10}'), (7, 2, _ts(1), '{"k": 20}')]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "props"])

    as_name = scd2_intervals(df, value_type="string").collect()
    as_type = scd2_intervals(df, value_type=StringType()).collect()
    assert sorted(map(tuple, as_name)) == sorted(map(tuple, as_type))
    assert {r["value"] for r in as_name} == {"10", "20"}

    with pytest.raises(ValueError, match="value_type"):
        scd2_intervals(df, value_type="long); DROP TABLE x; --").collect()
    with pytest.raises(ValueError, match="value_type"):
        scd2_intervals(df, value_type="not_a_type").collect()


def test_scd2_intervals_tile_without_overlap(spark):
    """On the harness stream, per entity the intervals are disjoint,
    ordered, and every closed interval's end equals the next start."""
    import os

    from yandex_tracker_exporter_spark.sources.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    events = load_table(spark, sf, "events")
    out = scd2_intervals(events.limit(2000)).collect()
    by_entity = {}
    for r in out:
        by_entity.setdefault(r["entity"], []).append(r)
    assert by_entity
    for rows in by_entity.values():
        rows.sort(key=lambda r: r["valid_from"])
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["is_current"] == 0
        assert rows[-1]["is_current"] == 1
        assert rows[-1]["valid_to"] == SCD2_OPEN_END


# ---------------------------------------------------------------------------
# resetting running total
# ---------------------------------------------------------------------------


def test_reset_running_total_resets_after_gap(spark):
    rows = [
        (1, 1, _ts(0, 0), 1.00),
        (1, 2, _ts(0, 30), 2.00),   # same session (30 min)
        (1, 3, _ts(2, 0), 4.00),    # 90 min gap → reset
        (1, 4, _ts(2, 10), 0.50),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    out = {r["event_id"]: r for r in reset_running_total(df).collect()}
    assert out[1]["running_cents"] == 100
    assert out[2]["running_cents"] == 300
    assert out[3]["running_cents"] == 400  # reset
    assert out[4]["running_cents"] == 450
    assert out[1]["session_idx"] == 1 and out[3]["session_idx"] == 2


# ---------------------------------------------------------------------------
# table profile
# ---------------------------------------------------------------------------


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        ["x", "y"],
    )
    out = {r["column_name"]: r for r in profile_table(df).collect()}
    assert out["x"]["n_rows"] == 4
    assert out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 3
    assert out["y"]["n_nulls"] == 1 and out["y"]["n_distinct"] == 2


# ---------------------------------------------------------------------------
# layout / search / encoding audits (batch 7)
# ---------------------------------------------------------------------------


def test_zorder_scans_fewer_files_than_natural(spark):
    """The point of the simulation: under the Morton layout a part-key
    range predicate must touch FEWER files than under natural order
    (where every file spans the whole part-key domain)."""
    import __spark_entry__ as entry_mod

    rows = {
        r["ordering"]: r
        for r in entry_mod.queries()["pruning_simulation"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["natural"]["n_rows_matched"] == rows["zorder"]["n_rows_matched"]
    assert rows["zorder"]["n_files_scanned"] < rows["natural"]["n_files_scanned"]


def test_trigram_search_equals_contains_scan(spark):
    """Index-path results must equal the brute-force contains() scan."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from yandex_tracker_exporter_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]
        for r in entry_mod.queries()["trigram_search"](spark, sf).collect()
    }
    expected = {
        r["doc_id"]
        for r in load_table(spark, sf, "documents")
        .where(F.col("text").contains("slow query"))
        .collect()
    }
    assert got == expected and expected


def test_encoding_audit_varint_compresses_sorted_keys(spark):
    """Delta+varint must beat raw 8-byte encoding on the clustered
    orderkey column (ratio well under 1000 milli) — the audit's reason
    to exist."""
    import __spark_entry__ as entry_mod

    rows = {
        r["column_name"]: r
        for r in entry_mod.queries()["encoding_audit"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["l_orderkey"]["ratio_milli"] < 300
    for r in rows.values():
        assert r["varint_bytes"] >= r["n_values"]  # ≥1 byte per value


def test_profile_table_hostile_column_names(spark):
    """Columns whose names are not bare SQL identifiers (spaces,
    hyphens, quotes) must profile fine: the raw name only ever appears
    as an escaped label literal, never as an identifier inside the
    generated stack() expression."""
    from yandex_tracker_exporter_spark.operators.profile import profile_table

    df = spark.createDataFrame([(1, "a"), (2, None)]).toDF(
        "order date", "it's-risky"
    )
    rows = {
        r["column_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in profile_table(df).collect()
    }
    assert rows == {"order date": (2, 0, 2), "it's-risky": (2, 1, 1)}


def test_kcore_local_finish_equals_distributed(spark):
    """The driver-local peel and the distributed rounds are the same
    bounded synchronous recurrence — byte-identical output on a graph
    with a deep tail, a true core, dup/reversed edges and self-loops,
    with the cap binding (rounds=3) and not (default)."""
    ring = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 4)]  # 3-core K4
    tail = [(4, 10)] + [(10 + i, 11 + i) for i in range(12)]
    noise = [(2, 1), (5, 5), (3, 4)]  # reversed dup, self-loop, dup
    df = spark.createDataFrame(ring + tail + noise, ["src", "dst"])
    for rounds in (3, 64):
        local = sorted(
            tuple(r)
            for r in kcore(df, k=3, rounds=rounds).collect()
        )
        dist = sorted(
            tuple(r)
            for r in kcore(
                df, k=3, rounds=rounds, local_finish_edges=0
            ).collect()
        )
        assert local == dist


def test_pagerank_local_finish_equals_distributed(spark):
    """Local replay of the fixed-point integer recurrence must be
    bit-identical to the distributed loop (weighted, with a dangling
    sink and a multi-edge)."""
    from yandex_tracker_exporter_spark.operators.graph import pagerank

    edges = [
        (1, 2, 3), (2, 3, 1), (3, 1, 2), (1, 3, 5), (4, 1, 7),
        (2, 4, 1), (5, 1, 1),  # 5 has out-edges; 4->1 makes 4 non-dangling
        (1, 6, 2),  # 6 is a dangling sink
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    local = sorted(
        tuple(r) for r in pagerank(df, weight="w", iterations=6).collect()
    )
    dist = sorted(
        tuple(r)
        for r in pagerank(
            df, weight="w", iterations=6, local_finish_edges=0
        ).collect()
    )
    assert local == dist


def test_kcore_cap_binds_loudly(spark):
    """ADVICE r7: the SQL oracle peels to the UNCAPPED fixpoint, so a
    peel that exhausts `rounds` without converging must RAISE instead
    of returning a silent superset. A 30-node path graph at k=2 peels
    one endpoint pair per round (~15 rounds to empty): rounds=3 must
    raise on BOTH the local-finish and the distributed path, and a
    sufficient budget must converge (to the empty core) on both."""
    import pytest

    path_edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(path_edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, rounds=3).collect()  # local finish (tiny graph)
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, rounds=3, local_finish_edges=0).collect()
    assert kcore(df, k=2, rounds=64).collect() == []
    assert kcore(df, k=2, rounds=64, local_finish_edges=0).collect() == []


def test_scd2_type_parser_public_first_with_fallback(monkeypatch):
    """ADVICE r11: type-name validation must ride the PUBLIC parser
    (DataType.fromDDL, PySpark 4.0+) and only fall back to the private
    _parse_datatype_string — and when NEITHER exists it must degrade
    to a loud RuntimeError naming the escape hatch, not an
    AttributeError from a renamed private."""
    import pytest
    from pyspark.sql import types as T

    from yandex_tracker_exporter_spark.operators.temporal import (
        _sql_type_name,
    )

    assert hasattr(T.DataType, "fromDDL")  # the public path this pins
    assert _sql_type_name("decimal(10,2)") == "decimal(10,2)"

    # public parser gone (older runtime): private fallback still works
    monkeypatch.delattr(T.DataType, "fromDDL")
    assert _sql_type_name("bigint") == "bigint"
    with pytest.raises(ValueError, match="value_type"):
        _sql_type_name("nope; DROP TABLE x")

    # both parsers gone: loud, actionable, no AttributeError leak
    monkeypatch.delattr(T, "_parse_datatype_string")
    with pytest.raises(RuntimeError, match="DataType instance"):
        _sql_type_name("bigint")
    # DataType instances keep working with no parser at all
    assert _sql_type_name(T.LongType()) == "bigint"
