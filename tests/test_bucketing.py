"""Bucketed co-located join: the orderkey fact-fact join plans WITHOUT a
shuffle once both tables are bucketed by the key — the storage decision the
analytics plans' 100 TB notes rely on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.bucketing import (
    cobucketed_join,
    write_bucketed,
)
from kafka_clickhouse_example_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", path=str(base / "orders"))
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", path=str(base / "lineitem"))
    yield "orders_b", "lineitem_b", orders, lineitem
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt, _, _ = bucketed_tables
    joined = cobucketed_join(spark, lt, rt, "o_orderkey", "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"co-bucketed join still shuffles:\n{plan[:2000]}"


def test_cobucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt, orders, lineitem = bucketed_tables
    bucketed_n = (
        cobucketed_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    plain_n = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, bucketed_n)) == sorted(map(tuple, plain_n))


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    """Bucketing pays off for aggregation too: groupBy on the bucket key
    reuses the on-disk hash distribution instead of shuffling."""
    _, rt, _, _ = bucketed_tables
    agg = spark.table(rt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan[:2000]}"
