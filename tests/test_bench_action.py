"""The bench timing action must execute the WHOLE query plan.

Round-8 finding (contrib/count_plan_audit.py): timing `df.count()` lets
Catalyst delete every deterministic computed column the count never reads
— windows with no rank filter, Arrow/pandas UDF projections, percentile
ObjectHashAggregates — plus the final sort (EliminateSorts). 31 of 190
registry queries lost Window/PythonEval/Aggregate nodes under count; their
benched "wall" was a parquet scan-count (customer_order_running_total
measured 0.22 s FLAT from sf0.1 to sf10 while the real query windows 15M
rows). bench.py therefore times a noop-sink write, which materializes
every output column with no driver transfer.

These tests pin BOTH halves: count() pruning is real (the motivation —
if a Spark upgrade stops pruning, the comment trail is stale but nothing
breaks), and the bench action executes unreferenced computed columns (the
fix — if someone reverts to count(), the raising-UDF test fails loudly).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql.functions import pandas_udf

import bench


def _raising_udf():
    @pandas_udf("long")
    def boom(s: pd.Series) -> pd.Series:
        # builtin exception: a custom class defined in this test module
        # cannot be unpickled inside Spark's worker interpreters
        raise RuntimeError("computed column was executed")

    return boom


def test_count_skips_unreferenced_computed_columns(spark):
    """Motivation: under count(), a deterministic UDF projection nobody
    reads is pruned — the UDF never runs, so the old timed action never
    paid for it."""
    boom = _raising_udf()
    df = spark.range(100).select("id", boom("id").alias("x"))
    assert df.count() == 100  # no _Marker: the projection was pruned


def test_bench_action_executes_unreferenced_computed_columns(spark):
    """Fix: the bench action computes every output column, so the same
    raising UDF surfaces."""
    boom = _raising_udf()
    df = spark.range(100).select("id", boom("id").alias("x"))
    with pytest.raises(Exception) as exc_info:
        bench._execute(df)
    assert "computed column was executed" in str(exc_info.value)


def test_bench_action_pays_window_and_sort(spark, sf_dir):
    """The registry query that exposed the bug: its count() plan loses the
    Window node entirely; the plan the bench action EXECUTES keeps it.

    Round-9 ADVICE hardening: the assertion runs against the physical
    plan the noop write actually executed (captured from the SQL status
    store via bench.executed_plan), not against df's own plan — if a
    future Spark version started applying EliminateSorts/ColumnPruning
    beneath V2 write commands, a df-plan assertion would stay green while
    bench under-measured again, the exact failure mode this test exists
    to prevent."""
    from kafka_clickhouse_example_spark.registry import all_queries

    df = all_queries()["customer_order_running_total"](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    def plan(d) -> str:
        return d._jdf.queryExecution().explainString(mode)

    assert "Window" in plan(df) and "Sort" in plan(df)
    count_plan = plan(df.groupBy().count())
    assert "Window" not in count_plan  # the pruning that hid 31 queries

    write_plan = bench.executed_plan(df)
    assert "Window" in write_plan and "Sort" in write_plan


def test_executed_plan_warns_when_write_execution_missing(spark, monkeypatch):
    """Round-10 ADVICE: executed_plan's fallback — newest execution when no
    OverwriteByExpression is found — can return an inner-iteration plan.
    The fallback must WARN so plan-honesty tests assert against it loudly,
    never silently. Simulated by swapping the action for a collect(): the
    status store's newest execution is then not a write."""
    monkeypatch.setattr(bench, "_execute", lambda df: df.collect())
    df = spark.range(10).selectExpr("id", "id * 2 AS x")
    with pytest.warns(bench.PlanLookupWarning, match="OverwriteByExpression"):
        bench.executed_plan(df)


def test_bench_artifact_declares_timed_action():
    """bench_compare refuses cross-action comparison via this field; it
    must stay in the artifact."""
    assert bench.TIMED_ACTION == "noop_write"
