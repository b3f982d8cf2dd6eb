"""Plan-hygiene sweep: physical plans of the analytic query families must
not contain accidental scale-killers. Guards the properties PLANS.md
documents — a refactor that silently turns a broadcast-equi join into a
nested-loop cartesian, or drops a pushed filter, fails here instead of in
production.

Scope: cheap-to-build families (TPC-H, corpus, behavior, temporal,
sampling). Memo-building families (flows/dedup/similarity) are excluded —
constructing their DataFrames triggers the memoized pipelines; their plans
are audited in PLANS.md and exercised by the parity suite.
"""

from __future__ import annotations

import pytest

from kafka_clickhouse_example_spark.registry import all_queries

SWEEP = [
    "q1_pricing_summary", "q3_shipping_priority", "q4_priority_with_big_items",
    "q5_region_revenue", "q7_nation_volume", "q8_market_share",
    "q10_returned_items", "q11_important_parts", "q12_late_shipments",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_diversity", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_revenue",
    "q22_idle_rich_customers", "orders_lineitem_integrity_audit",
    "orders_price_lines_correlation", "orders_profile_report",
    "events_hourly_rollup", "events_grouping_sets", "events_value_outliers",
    "events_top_types_sketch", "events_time_weighted_avg",
    "events_user_trailing_hour", "events_type_day_pivot",
    "text_chunk_overlap", "text_top_bigrams_per_lang",
    "text_vocab_stats_per_source", "quality_gate_above_source_avg",
    "vocab_src_full_outer_diff", "sample_fixed_k_per_lang",
    "sample_documents_10pct",
    # round-3 session-2 additions
    "text_pii_scan", "text_pii_redact", "text_clean_normalize",
    "events_dau_wau_mau", "events_attribution_last_touch",
    "events_decayed_value_sum", "events_session_paths",
    "events_value_skew_kurtosis", "events_hourly_autocorrelation",
    "events_value_benford", "events_value_mad_outliers",
    "orders_part_affinity", "events_signup_to_purchase_latency",
    "diag_join_key_skew", "diag_join_cardinality", "orders_pareto_8020",
    "events_wow_growth", "events_cusum_changepoint", "events_cohort_ltv",
    "emb_centroid_drift", "flows_fanout_detector",
    "flows_conversation_asymmetry", "privacy_k_anonymity_audit",
    "events_revenue_trend_ols", "events_seasonal_naive_backtest",
    "diag_snapshot_diff", "dedup_reach3_sql_recursive",
    "events_conversion_ab_test", "documents_lang_source_chi2",
    "events_survival_km", "events_type_day_unpivot", "diag_table_stats",
]

# Queries whose cross/nested-loop join is deliberate: a 1-row (or
# |groups|-row) broadcast scalar/threshold side crossed into the scan.
CROSS_OK = {
    "q11_important_parts", "events_value_outliers", "q22_idle_rich_customers",
    # 1-row broadcast totals/stats crossed into compact relations
    "events_value_benford", "diag_join_key_skew", "diag_join_cardinality",
    "orders_part_affinity", "orders_pareto_8020",
    # 1-row broadcast bounds/totals crosses
    "events_revenue_trend_ols", "emb_centroid_drift",
    "documents_lang_source_chi2", "events_survival_km",
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = all_queries()
    out = {}
    for name in SWEEP:
        df = qs[name](spark, sf_dir)
        out[name] = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    return out


def test_no_accidental_cartesian(plans):
    bad = [
        n
        for n, p in plans.items()
        if n not in CROSS_OK
        and ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
    ]
    assert not bad, f"cartesian/nested-loop join crept into: {bad}"


def test_fact_scans_prune_columns(plans):
    """The q1 lineitem scan must not read all 11 columns for a 7-column
    aggregate — ReadSchema pruning is the cheapest 100 TB win there is."""
    p = plans["q1_pricing_summary"]
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, "no ReadSchema in q1 plan"
    assert len(m.group(1).split(",")) <= 7, m.group(1)


def test_filters_are_pushed(plans):
    # r11: InferFiltersFromConstraints is excluded (it broke ReuseExchange
    # on view-consumed-twice shapes — session.configure_runtime), so the
    # inferred IsNotNull companions no longer appear in PushedFilters; the
    # EXPLICIT predicates must still reach the scan. A `<=`/`=` predicate
    # rejects nulls by itself, so skipping semantics are unchanged.
    assert "LessThanOrEqual(l_shipdate," in plans["q1_pricing_summary"]
    assert "PushedFilters: [" in plans["q1_pricing_summary"]
    assert "EqualTo(p_type,STANDARD)" in plans["q8_market_share"]
    assert "EqualTo(l_returnflag,R)" in plans["q10_returned_items"]


# Queries built on the per-group top-k rank pattern (row_number over a
# partitioned window, filtered <= k). Spark only plans the map-side
# pre-cut (Partial WindowGroupLimit before the exchange — k rows per
# group per upstream partition instead of whole groups through the
# shuffle) when the rank/filter shape stays inferable; a refactor that
# e.g. filters on an expression OF the rank column silently reverts to
# shipping full groups. Pin the pushdown for every such query.
RANK_LIMIT_QUERIES = [
    "sample_fixed_k_per_lang",
    "text_top_bigrams_per_lang",
    "top3_orders_per_customer",
    "events_user_cardinality_approx",
    "events_daily_users_sketch_merge",
]


def test_no_row_at_a_time_python_udfs(plans):
    """Python in a plan must be Arrow-batched (ArrowEvalPython,
    MapInPandas, FlatMapGroupsInPandas, ...) — never BatchEvalPython,
    the row-at-a-time pickled path that costs 10-100x on the hot path.
    The repo-wide claim ('zero row-at-a-time UDFs') has been re-audited
    by hand every round; this pins it for the sweep families so a
    convenience F.udf() can never slip in unnoticed."""
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF crept into: {bad}"


def test_rank_limit_windows_push_group_limits(spark, sf_dir):
    import re

    qs = all_queries()
    for name in RANK_LIMIT_QUERIES:
        p = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert re.search(r"WindowGroupLimit.*Partial", p), (
            f"{name}: rank-limit window lost its Partial WindowGroupLimit "
            "pre-cut (whole groups now cross the shuffle)"
        )
