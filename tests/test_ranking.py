"""Distributed rank/ntile: exact window-function semantics, no global Window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.ranking import (
    with_global_ntile,
    with_global_rank,
)


@pytest.fixture(scope="module")
def vals(spark):
    # Duplicate sort values force the tiebreak; sizes chosen so N % n != 0.
    rows = [(i, (i * 37) % 11) for i in range(103)]
    return spark.createDataFrame(rows, "id long, v long").repartition(7)


def test_global_rank_matches_row_number(spark, vals):
    got = {
        r["id"]: r["rank"]
        for r in with_global_rank(vals, ["v", "id"], num_partitions=5).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rn"]
        for r in vals.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [4, 10])
def test_global_ntile_matches_window_ntile(spark, vals, n):
    got = {
        r["id"]: r["tile"]
        for r in with_global_ntile(vals, ["v", "id"], n, num_partitions=5).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["nt"]
        for r in vals.withColumn("nt", F.ntile(n).over(w)).collect()
    }
    assert got == want


def test_no_single_partition_window(spark, vals):
    plan = (
        with_global_ntile(vals, ["v", "id"], 4, num_partitions=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, f"global Window snuck into the plan:\n{plan[:1500]}"
    assert "SinglePartition" not in plan


def test_write_training_shards_caps_rows_per_file(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from kafka_clickhouse_example_spark.operators.packing import write_training_shards

    df = spark.range(1000).selectExpr("id", "id % 7 as k")
    out = str(tmp_path / "shards")
    n = write_training_shards(df, out, rows_per_shard=128, order_cols=["id"])
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) == n
    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert all(c <= 128 for c in counts)
    assert sum(counts) == 1000
    # stable global order: each shard's id range is disjoint and sorted
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["id"]).column("id").to_pylist()
        assert t == sorted(t)
        ranges.append((t[0], t[-1]))
    ranges.sort()
    for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
        assert b1 < a2
