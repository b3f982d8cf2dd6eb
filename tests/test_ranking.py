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


def test_reserved_column_clash_raises(spark, vals):
    """ADVICE r5: internal names (_rank_w/_rank_off/_pid/offset_col) must
    be guarded — a clashing input column previously failed with an opaque
    duplicate-column error or silently corrupted the rank."""
    import pytest as _pytest

    from kafka_clickhouse_example_spark.operators.packing import (
        stream_offsets_with_total,
    )

    poisoned = vals.withColumn("_rank_off", F.lit(0))
    with _pytest.raises(ValueError, match="reserved column"):
        with_global_rank(poisoned, ["v", "id"])

    with _pytest.raises(ValueError, match="reserved column"):
        stream_offsets_with_total(
            vals.withColumn("_pid", F.lit(0)), "v", ["v", "id"]
        )
    # output-name clash counts too
    with _pytest.raises(ValueError, match="rank"):
        with_global_rank(vals, ["v", "id"], rank_col="v")
    with _pytest.raises(ValueError, match="tile_col"):
        with_global_ntile(vals.withColumn("tile", F.lit(1)), ["v", "id"], 4)
