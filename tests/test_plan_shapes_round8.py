"""Per-query physical-plan contracts, round 8 (VERDICT r7 #6): the
referee ledger had 71/151 queries with a targeted property or plan
test; the rest relied on the oracle referee plus blanket guards (no
CartesianProduct anywhere, no unjustified BNLJ, bounded
single-partition exchanges). This family pins the PLAN SHAPE of 30
more queries whose scale story depends on it — broadcast-dependent
joins, single-shuffle claims, partial aggregation, top-k sorts, and
the counted-bound driver-local finishes.

Each spec lists what the plan MUST contain (``require``: substring →
min count), MUST NOT exceed (``max``: substring → max count), and MUST
NOT contain at all (``forbid``). Counts were read off the executed
plans at the test scale factor and then loosened to the structural
invariant (e.g. "at most one hash exchange" rather than "exactly these
operators") so AQE re-planning can't flake them.
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

NO_PAIRS_BLOWUP = ["CartesianProduct", "BroadcastNestedLoopJoin"]

#: query -> plan contract. Comments give the scale rationale the
#: contract protects.
PLAN_SPECS = {
    # ---- ANN / broadcast-dependent joins ----
    # corpus never shuffles: tiny query side broadcast through the one
    # justified non-equi BNLJ; the only hash exchange is the per-query
    # ranking window
    "cosine_topk": dict(
        require={"BroadcastExchange": 1},
        max={"BroadcastNestedLoopJoin": 1, "Exchange hashpartitioning": 1},
        forbid=["CartesianProduct", "SortMergeJoin"],
    ),
    # bucket equi-join replaces the cross: hash join, never nested-loop
    "lsh_bucket_topk": dict(
        require={"BroadcastHashJoin": 1},
        max={"Exchange hashpartitioning": 1},
        forbid=NO_PAIRS_BLOWUP,
    ),
    # PPJoin: prefix-token equi-join + verify; an all-pairs plan here is
    # the classic quadratic blowup
    "prefix_jaccard_join": dict(
        require={"HashAggregate": 2}, forbid=NO_PAIRS_BLOWUP
    ),
    "edit_distance_pairs": dict(
        # the LSH candidate stage (and its Arrow kernel) moved into the
        # shared session-materialized pairs relation (round 9) — this
        # query is now the steady-state consumer: JVM levenshtein over
        # broadcast-joined candidates, no Python anywhere in ITS plan
        require={"levenshtein": 1, "BroadcastHashJoin": 2},
        forbid=NO_PAIRS_BLOWUP + ["ArrowEvalPython"],
    ),
    "minhash_calibration": dict(
        require={"BroadcastHashJoin": 1}, forbid=NO_PAIRS_BLOWUP
    ),
    # broadcast panel against the corpus scan; one shuffle for ranking
    "knn_classify": dict(
        require={"BroadcastExchange": 1},
        max={"BroadcastNestedLoopJoin": 1, "Exchange hashpartitioning": 1},
        forbid=["CartesianProduct", "SortMergeJoin"],
    ),
    "knn_confusion": dict(
        require={"BroadcastExchange": 1},
        max={"BroadcastNestedLoopJoin": 1, "Exchange hashpartitioning": 2},
        forbid=["CartesianProduct", "SortMergeJoin"],
    ),
    # ---- graph family: equi-joins only, bounded exchanges ----
    # r12: the edge derivation's stats changed (collect_list+explode
    # instead of a self-join), so at test scale the wedge/closure
    # equi-joins now broadcast the checkpointed edge relation instead
    # of sort-merging — the strategy is AQE/size-driven (SMJ returns
    # past the broadcast threshold); the contract is that both joins
    # stay EQUI-joins of any strategy, never a pairs blowup
    "triangle_count": dict(
        require={"Join": 2}, forbid=NO_PAIRS_BLOWUP
    ),
    "component_sizes": dict(
        require={"HashAggregate": 2}, forbid=NO_PAIRS_BLOWUP
    ),
    "assortativity": dict(
        max={"Exchange SinglePartition": 1},  # only the final scalar
        forbid=NO_PAIRS_BLOWUP,
    ),
    # counted-bound driver-local finish: at the test scale the peel /
    # rank replay compacts to a LocalTableScan — NO exchange at all
    # (at 100 TB the gate doesn't fire and the distributed recurrence
    # runs; tests/test_graph.py pins byte-equality of the two paths)
    "kcore_3": dict(forbid=["Exchange", "CartesianProduct"]),
    "pagerank_nations": dict(forbid=["Exchange", "CartesianProduct"]),
    # ---- joins that must broadcast the small side ----
    "anti_join": dict(
        require={"BroadcastHashJoin": 1},
        forbid=["CartesianProduct", "SortMergeJoin", "Exchange hashpartitioning"],
    ),
    "cheapest_supplier": dict(
        require={"BroadcastHashJoin": 1},
        max={"Exchange hashpartitioning": 1},
        forbid=["CartesianProduct", "SortMergeJoin"],
    ),
    "copurchase_recs": dict(
        require={"BroadcastHashJoin": 1}, forbid=NO_PAIRS_BLOWUP
    ),
    "pit_enrich": dict(
        require={"BroadcastHashJoin": 1}, forbid=NO_PAIRS_BLOWUP
    ),
    "trigram_search": dict(
        require={"BroadcastHashJoin": 1},
        max={"Exchange hashpartitioning": 1},
        forbid=["CartesianProduct", "SortMergeJoin"],
    ),
    "funnel_conversion": dict(
        require={"BroadcastHashJoin": 1},
        max={"Exchange SinglePartition": 1},
        forbid=["CartesianProduct"],
    ),
    # ---- aggregation shapes: map-side partials, single shuffle ----
    "rollup_orders": dict(
        require={"Expand": 1, "HashAggregate": 2},
        max={"Exchange hashpartitioning": 1},
    ),
    "cube_orders": dict(
        require={"Expand": 1, "HashAggregate": 2},
        max={"Exchange hashpartitioning": 1},
    ),
    "grouping_sets_orders": dict(
        require={"Expand": 1, "HashAggregate": 2},
        max={"Exchange hashpartitioning": 1},
    ),
    "pivot_orders": dict(
        require={"HashAggregate": 2},
        max={"Exchange hashpartitioning": 2},
        forbid=["CartesianProduct"],
    ),
    "distinct_agg": dict(
        require={"HashAggregate": 2},
        forbid=["CartesianProduct", "SortMergeJoin"],
    ),
    "top_sources_agg": dict(
        require={"HashAggregate": 2},
        max={"Exchange hashpartitioning": 2},
        forbid=["CartesianProduct"],
    ),
    # sketches: fixed-register partial aggregation, never a distinct
    # shuffle of raw values; single-row combine joins are justified
    "hll_union": dict(require={"HashAggregate": 2}, forbid=["CartesianProduct"]),
    "kmv_intersection": dict(
        require={"HashAggregate": 2}, forbid=["CartesianProduct"]
    ),
    # ---- streaming-adjacent / sequence shapes: one shuffle ----
    "windowed_counts": dict(
        require={"HashAggregate": 2},
        max={"Exchange hashpartitioning": 1},
    ),
    "session_window_native": dict(
        max={"Exchange hashpartitioning": 1}, forbid=["CartesianProduct"]
    ),
    "event_pattern": dict(
        max={"Exchange hashpartitioning": 1}, forbid=["CartesianProduct"]
    ),
    # top-k must plan as TakeOrderedAndProject, never a global sort
    "top_paths": dict(
        require={"TakeOrderedAndProject": 1},
        max={"Exchange hashpartitioning": 2},
        forbid=["Exchange rangepartitioning"],
    ),
}


@pytest.mark.parametrize("name", sorted(PLAN_SPECS))
def test_plan_contract(spark, name):
    spec = PLAN_SPECS[name]
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for sub, n in spec.get("require", {}).items():
        assert plan.count(sub) >= n, (
            f"{name}: expected >= {n} of {sub!r}, saw {plan.count(sub)}"
        )
    for sub, n in spec.get("max", {}).items():
        assert plan.count(sub) <= n, (
            f"{name}: expected <= {n} of {sub!r}, saw {plan.count(sub)}"
        )
    for sub in spec.get("forbid", []):
        assert sub not in plan, f"{name}: plan contains forbidden {sub!r}"
