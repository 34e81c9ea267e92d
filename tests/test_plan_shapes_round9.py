"""Per-query physical-plan contracts, round 9 (VERDICT r8 #4): closes
the plan/property ratchet — the 50 contract queries that still relied
on the oracle referee plus blanket guards now each pin the plan shape
their scale story depends on. With this family every one of the 151
contract queries carries a targeted property or plan test.

Same spec format and loosened-invariant style as
``tests/test_plan_shapes_round8.py``: ``require`` (substring → min
count), ``max`` (substring → max count), ``forbid`` (absent entirely).
Counts were read off the executed plans at the test scale factor.

The round-9 pins, by scale class:

- **Map-only functions** (bytes_human, canonicalize_text,
  display_timezone, json_value_extract, pii_redact,
  quantize_embeddings, snake_case_normalize): NO exchange, NO join, NO
  row-at-a-time Python — a pure projection pipeline that scales as the
  scan. Any exchange appearing here is a regression.
- **Media decoders** (media_decode_features, media_image_histogram):
  Arrow-batched MapInPandas over a single scan pass — never
  BatchEvalPython (row-at-a-time), never an exchange before the decode.
- **Single-shuffle aggregates / windows**: partial aggregation
  (HashAggregate×2 = partial+final) with a bounded exchange count;
  top-k endings must plan TakeOrderedAndProject, never a global sort
  (no rangepartitioning exchange).
- **Sketch aggregates** (value_percentiles, ewma_daily, robust_stats,
  conversion_latency): ObjectHashAggregate partials — percentile /
  state sketches combine map-side; a global sort here would be the
  quadratic-at-scale formulation.
- **Broadcast-dependent joins** (sql_interface, trade_volume_q7,
  set_ops, vocab_oov_stats, mom_revenue, pareto_8020,
  weekday_seasonality, dedup_keep_best, gap_fill_hourly,
  conversion_latency, robust_stats, pruning_simulation,
  contingency_chi2): dimension/stat sides must broadcast — a
  SortMergeJoin means the corpus shuffled for a small side.
- **Justified single-row BNLJ** (ab_test, cluster_balance,
  negative_sampling, skew_report, weekly_churn, gap_fill_hourly,
  contingency_chi2): exactly one BroadcastNestedLoopJoin against a
  one-row statistics relation is the documented pattern; more than one
  (or a CartesianProduct) is forbidden.
- **Counted-bound driver-local finish** (dedup_clusters): at the test
  scale the union-find finish compacts to a LocalTableScan — no
  exchange at all (the distributed fixpoint twin is pinned byte-equal
  in tests/test_dedup_clusters.py).
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

CART = "CartesianProduct"
SMJ = "SortMergeJoin"
BNLJ = "BroadcastNestedLoopJoin"
HASH_EX = "Exchange hashpartitioning"
SINGLE_EX = "Exchange SinglePartition"
RANGE_EX = "Exchange rangepartitioning"

#: a pure projection pipeline: the whole query is scan-side
MAP_ONLY = dict(forbid=["Exchange", CART, "Join", "BatchEvalPython"])

#: map-only but kernel-heavy: allows the single ensure_parallelism
#: round-robin re-split (single-row-group corpora scan as ONE task;
#: the re-split is what parallelizes the CPU-heavy stage) — still no
#: KEYED exchange, no join, no row-at-a-time Python
MAP_ONLY_RESPLIT = dict(
    max={"Exchange": 1},
    forbid=[HASH_EX, RANGE_EX, SINGLE_EX, CART, "Join", "BatchEvalPython"],
)

PLAN_SPECS = {
    # ---- map-only scalar/projection functions ----
    "bytes_human": MAP_ONLY,
    "canonicalize_text": MAP_ONLY,
    "display_timezone": MAP_ONLY,
    "json_value_extract": MAP_ONLY,
    "pii_redact": MAP_ONLY_RESPLIT,
    "quantize_embeddings": MAP_ONLY_RESPLIT,
    "snake_case_normalize": MAP_ONLY,
    # ---- media decode: Arrow-batched, single scan pass ----
    "media_decode_features": dict(
        require={"MapInPandas": 1},
        max={"Exchange": 1},  # the ensure_parallelism round-robin re-split
        forbid=[HASH_EX, RANGE_EX, SINGLE_EX, CART, "BatchEvalPython"],
    ),
    "media_image_histogram": dict(
        require={"MapInPandas": 1, "HashAggregate": 2},
        max={HASH_EX: 1},
        forbid=[CART, "BatchEvalPython"],
    ),
    # ---- counted-bound driver-local finish ----
    "dedup_clusters": dict(forbid=["Exchange", CART]),
    # ---- single-shuffle aggregates ----
    "bigram_counts": dict(
        require={"HashAggregate": 2, "TakeOrderedAndProject": 1},
        max={HASH_EX: 1},
        forbid=[CART, RANGE_EX],
    ),
    "bpe_first_merges": dict(
        require={"HashAggregate": 2, "TakeOrderedAndProject": 1},
        max={HASH_EX: 2},
        forbid=[CART, RANGE_EX],
    ),
    "heatmap_hour_value": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 1}, forbid=[CART]
    ),
    "value_histogram": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 1}, forbid=[CART]
    ),
    "dataset_card": dict(
        require={"Expand": 1, "HashAggregate": 2},
        max={HASH_EX: 1, SINGLE_EX: 1},
        forbid=[CART],
    ),
    "dedup_pipeline_report": dict(
        require={"HashAggregate": 2},
        max={HASH_EX: 3},
        forbid=[CART, BNLJ],
    ),
    # ---- sketch partials (ObjectHashAggregate), never a global sort ----
    "value_percentiles": dict(
        require={"ObjectHashAggregate": 2},
        max={HASH_EX: 1},
        forbid=[CART, RANGE_EX],
    ),
    "ewma_daily": dict(
        require={"ObjectHashAggregate": 2}, max={HASH_EX: 2}, forbid=[CART]
    ),
    "robust_stats": dict(
        require={"ObjectHashAggregate": 2, "BroadcastHashJoin": 1},
        max={HASH_EX: 3},
        forbid=[CART, SMJ],
    ),
    "conversion_latency": dict(
        require={"BroadcastHashJoin": 1, "ObjectHashAggregate": 2},
        max={HASH_EX: 2, SINGLE_EX: 1},
        forbid=[CART, SMJ],
    ),
    # ---- window/sequence shapes: bounded exchanges ----
    "business_hours_duration": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 1}, forbid=[CART]
    ),
    "encoding_audit": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 2}, forbid=[CART]
    ),
    "event_transitions": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 2}, forbid=[CART]
    ),
    "last_touch": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 2}, forbid=[CART]
    ),
    "session_gaps": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 1}, forbid=[CART]
    ),
    "state_dwell_time": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 2}, forbid=[CART]
    ),
    "twap_by_type": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 2}, forbid=[CART]
    ),
    "ntile_quartiles": dict(
        require={"HashAggregate": 2},
        max={HASH_EX: 1},
        forbid=[CART, RANGE_EX],
    ),
    "ohlc_hourly": dict(
        require={"HashAggregate": 2}, max={HASH_EX: 1}, forbid=[CART]
    ),
    "percent_rank_acctbal": dict(max={HASH_EX: 1}, forbid=[CART]),
    "reset_running_total": dict(max={HASH_EX: 1}, forbid=[CART]),
    "top_docs_per_lang": dict(
        max={HASH_EX: 1}, forbid=[CART, RANGE_EX]
    ),
    "moving_avg_daily": dict(
        require={"HashAggregate": 2},
        # the global window runs over one row per day — counted-bound
        max={HASH_EX: 1, SINGLE_EX: 1},
        forbid=[CART],
    ),
    "rolling_corr_7d": dict(
        require={"HashAggregate": 2},
        max={HASH_EX: 2, SINGLE_EX: 1},
        forbid=[CART],
    ),
    # ---- broadcast-dependent joins ----
    "sql_interface": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2},
        max={HASH_EX: 1},
        forbid=[CART, SMJ],
    ),
    "trade_volume_q7": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2},
        max={HASH_EX: 1},
        forbid=[CART, SMJ],
    ),
    "set_ops": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2},
        max={HASH_EX: 1},
        forbid=[CART, SMJ],
    ),
    "vocab_oov_stats": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2,
                 "TakeOrderedAndProject": 1},
        max={HASH_EX: 2},
        forbid=[CART, SMJ, RANGE_EX],
    ),
    "mom_revenue": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2},
        max={HASH_EX: 2},
        forbid=[CART, SMJ],
    ),
    "pareto_8020": dict(
        require={"BroadcastHashJoin": 1},
        max={HASH_EX: 2},
        forbid=[CART, SMJ],
    ),
    "weekday_seasonality": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2},
        max={HASH_EX: 3},
        forbid=[CART, SMJ],
    ),
    "dedup_keep_best": dict(
        require={"BroadcastHashJoin": 1},
        max={HASH_EX: 1},
        forbid=[CART, SMJ],
    ),
    "pruning_simulation": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2},
        # the four single-partition exchanges each carry a handful of
        # simulated-layout summary rows — counted-bound
        max={HASH_EX: 6, SINGLE_EX: 4},
        forbid=[CART, SMJ, BNLJ],
    ),
    "contingency_chi2": dict(
        require={"BroadcastHashJoin": 1, "HashAggregate": 2},
        max={HASH_EX: 6, SINGLE_EX: 1, BNLJ: 1},
        forbid=[CART, SMJ],
    ),
    "gap_fill_hourly": dict(
        require={"BroadcastHashJoin": 1},
        max={HASH_EX: 2, BNLJ: 1},
        forbid=[CART, SMJ],
    ),
    # ---- justified single-row-stats BNLJ ----
    "ab_test": dict(
        require={"HashAggregate": 2},
        max={HASH_EX: 4, BNLJ: 1},
        forbid=[CART, SMJ],
    ),
    "cluster_balance": dict(
        require={"HashAggregate": 2},
        max={HASH_EX: 2, SINGLE_EX: 1, BNLJ: 1},
        forbid=[CART, SMJ],
    ),
    "negative_sampling": dict(
        require={"HashAggregate": 2},
        max={HASH_EX: 1, SINGLE_EX: 1, BNLJ: 1},
        forbid=[CART, SMJ],
    ),
    "skew_report": dict(
        require={"HashAggregate": 2, "TakeOrderedAndProject": 1},
        max={HASH_EX: 2, SINGLE_EX: 1, BNLJ: 1},
        forbid=[CART, SMJ, RANGE_EX],
    ),
    "weekly_churn": dict(
        require={"HashAggregate": 2},
        max={HASH_EX: 3, SINGLE_EX: 1, BNLJ: 1},
        forbid=[CART, SMJ],
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


def test_round9_specs_cover_the_full_contract():
    """Round-9 completion pin: the union of targeted plan/property
    coverage (this file + everything the ledger already cites) must be
    the WHOLE contract — no query is oracle-parity-plus-blanket only."""
    import json

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "REFEREE_COVERAGE.json")) as fh:
        cov = json.load(fh)
    assert cov["with_property"] == cov["n_queries"]
