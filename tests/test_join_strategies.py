"""Join-strategy invariance: the same logical plan must produce identical
results under broadcast, shuffle-hash, and sort-merge physical strategies —
the property that makes hint/AQE-driven strategy switches at 100 TB safe.
Also asserts the hints actually changed the physical plan, so the test
can't pass vacuously."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.sources.catalog import load_compute_table


@pytest.fixture(scope="module")
def joined_inputs(spark, sf_dir):
    orders = load_compute_table(spark, sf_dir, "orders")
    customer = load_compute_table(spark, sf_dir, "customer")
    return orders, customer


def _revenue_by_segment(orders, customer, hint: str | None):
    dim = customer if hint is None else customer.hint(hint)
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_results_identical_across_join_strategies(spark, joined_inputs):
    orders, customer = joined_inputs
    results = {}
    plans = {}
    for hint in ("broadcast", "shuffle_hash", "merge"):
        df = _revenue_by_segment(orders, customer, hint)
        plans[hint] = _physical(df)
        results[hint] = [tuple(r) for r in df.collect()]
    assert results["broadcast"] == results["shuffle_hash"] == results["merge"]
    # the hints really selected different physical operators
    assert "BroadcastHashJoin" in plans["broadcast"]
    assert "ShuffledHashJoin" in plans["shuffle_hash"]
    assert "SortMergeJoin" in plans["merge"]
    # exact DECIMAL revenue: strategy cannot perturb the aggregate
    assert all(r[2] is not None for r in results["merge"])
