"""Plan-quality gate: every contract query must compile to a sane physical
plan — no cartesian products anywhere, predicate/projection pushdown on the
DSL scans, broadcast joins for dim tables, TakeOrderedAndProject for top-k.
This is the executable form of the 100 TB design claims in README."""

import re

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def plan_of(spark, name):
    df = em.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


# queries that legitimately skip the scan-plan checks (driver-side writes,
# streaming runs, or tiny collected inputs)
HEAVY_SETUP = {
    "storage_partitioned_roundtrip",
    "streaming_pipeline_gate",
    "streaming_stateful_counts",
    "streaming_join_gate",
    "streaming_late_routing",       # full streaming replay through the sink
    "crud_batch_writer_roundtrip",  # per-object driver feed + segment writes
    "storage_segment_rolling",      # two full codec writes; result is a local table
    "storage_collide_policy",       # two bucket writes incl. an expected failure
    "streaming_hll_windows",        # full streaming replay; result finalizes emitted registers
    "streaming_pit_enrichment",     # full streaming replay through foreachBatch asof joins
    "streaming_interval_join",      # full two-stream replay through the parquet sink
    "streaming_interval_join_outer",  # same, plus sentinel-driven watermark flush
}


# Queries where a BroadcastNestedLoopJoin IS the intended physical plan:
# the build side is tiny by construction (a 1-row scalar aggregate, or a
# literal interval-lookup dim), so the "nested loop" is a constant-time probe
# per row — the correct shape at any scale.
INTENTIONAL_BNLJ = {
    "q22_idle_balance_customers",  # 1-row broadcast scalar subquery
    "join_range_value_bands",      # 4-row broadcast range-lookup dim
    "q15_top_supplier",            # 1-row broadcast scalar max
    "events_gap_fill",             # dense-grid cross join of two tiny dims
    "q11_important_stock",         # 1-row broadcast scalar total (threshold)
    "sketch_hll_cardinality",      # 1-row estimate x 1-row broadcast truth
    "profile_histogram_drift",     # ≤bins rows x 1-row broadcast totals
    "text_relevance_topk",         # corpus x 1-row broadcast (N, avgdl, df) stats
    "corpus_domain_rollup",        # per-source rows x 1-row broadcast corpus total
    "sketch_quantile_hist",        # ≤bins rows x 5-row broadcast quantile list
    "sketch_quantile_by_group",    # groups×bins rows x 5-row broadcast quantile list
    "sketch_hll_intersection",     # three 1-row estimates joined 1x1x1
    "graph_triangles",             # three 1-row global counts joined 1x1x1
    "text_lm_surprisal",           # corpus x 1-row broadcast vocab-size scalar
    "text_vocab_drift",            # word table x 1-row broadcast (ta, tb, v) totals
    "profile_chi2_independence",   # cell table x 1-row broadcast (n, nr, nc) totals
    "profile_benford",             # 9-digit rows x 1-row broadcast total
    "profile_join_size",           # three 1-row aggregates joined 1x1x1
    "events_rfm_segments",         # per-user aggregate x 1-row broadcast max-ts "now"
    "profile_inclusion_deps",      # per pair: two 1-row aggregates joined 1x1
    "graph_global_stats",          # three 1-row scalar aggregates joined 1x1x1
    "events_active_users",         # covered-days x 1-row broadcast max-day cut
    "text_source_similarity",      # group-sized signature self-join (groups << rows)
    "graph_rectangles",            # three 1-row global counts joined 1x1x1
    "graph_diameter_2sweep",       # four 1-row scalars (seeds/eccs) joined 1x1x1x1
    "events_allen_relations",      # ≤13 relation rows x 1-row broadcast total
    "events_shapley_attribution",  # 2^n literal coalition frames, subset-bitmask joins
    "sketch_kmv_jaccard",          # three 1-row sketch aggregates joined 1x1x1
}


def test_no_cartesian_products(spark):
    for name in em.queries():
        if name in HEAVY_SETUP:
            continue
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
        if name not in INTENTIONAL_BNLJ:
            assert "BroadcastNestedLoopJoin" not in plan, f"{name} has a nested-loop join"


@pytest.mark.parametrize("name", ["dsl_range_dates", "dsl_equals_in", "q6_forecast_revenue"])
def test_filters_pushed_to_scan(spark, name):
    plan = plan_of(spark, name)
    # plan strings truncate long filter lists ("...") so don't require the
    # closing bracket — just a non-empty pushed-filter list on some scan
    m = re.search(r"PushedFilters: \[([^\]\n]+)", plan)
    assert m and m.group(1).strip(), f"{name}: no pushed filters\n{plan[:500]}"


def test_corpus_sampling_is_narrow_and_pruned(spark):
    """Deterministic sampling/mixing must stay a pure filter over a pruned
    scan: no shuffle anywhere, and the parquet read restricted to the
    referenced columns."""
    plan = plan_of(spark, "corpus_mix_sample")
    agg_exchanges = plan.count("Exchange")
    # one exchange pair for the final groupBy is fine; the sampling filter
    # itself must not add any
    assert agg_exchanges <= 2, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = sorted(c.split(":")[0] for c in m.group(1).split(","))
    assert cols == ["doc_id", "source"], cols


def test_contamination_gram_join_is_broadcast(spark):
    """The benchmark gram-key set must broadcast — the corpus side of the
    contamination join never shuffles."""
    plan = plan_of(spark, "corpus_contamination")
    assert "BroadcastHashJoin" in plan, plan


def test_projection_pruned(spark):
    plan = plan_of(spark, "dsl_topk")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert set(cols) == {"c_custkey", "c_name", "c_acctbal"}, cols


def test_topk_uses_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "dsl_topk")
    assert "TakeOrderedAndProject" in plan_of(spark, "q3_shipping_priority")


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "q5_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_rfm_windows_all_partitioned(spark):
    """events_rfm_segments must never sort in one unpartitioned window
    (VERDICT r7): every Window in the gate's plan is keyed on __pid and
    ntile is gone (tiles derive from the two-phase global rank)."""
    plan = plan_of(spark, "events_rfm_segments")
    assert "ntile" not in plan, plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "__pid" in line, f"unpartitioned window:\n{line}"
