"""Iterative-operator materialization: reliable checkpoint option and the
empty-edge-list guard (VERDICT/ADVICE r2)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.checkpointing import materialize
from kafka_clickhouse_example_spark.operators.dedup import duplicate_clusters
from kafka_clickhouse_example_spark.operators.graph import pagerank_q30


def _pairs(spark):
    # Two clusters {1,2,3} and {10,11}, plus an isolated pairless node set.
    return spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )


def _sym_edges(pairs):
    return pairs.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).unionAll(pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))


def test_pagerank_empty_edges_returns_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank_q30(empty)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0
    assert dict(out.dtypes)["rank"] == "bigint"


def test_reliable_checkpoint_matches_local_and_writes_dir(spark, tmp_path):
    ck = str(tmp_path / "reliable_ck")
    pairs = _pairs(spark)

    local = {tuple(r) for r in duplicate_clusters(pairs).collect()}
    reliable = {
        tuple(r) for r in duplicate_clusters(pairs, reliable_dir=ck).collect()
    }
    assert reliable == local == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    edges = _sym_edges(pairs)
    pr_local = {tuple(r) for r in pagerank_q30(edges).collect()}
    pr_rel = {tuple(r) for r in pagerank_q30(edges, reliable_dir=ck).collect()}
    assert pr_rel == pr_local and len(pr_rel) == 5

    # Reliable checkpoints actually landed on the shared filesystem.
    assert any(Path(ck).rglob("*")), "checkpoint dir must contain RDD blocks"


def test_reliable_checkpoint_truncates_lineage(spark, tmp_path):
    ck = str(tmp_path / "ck2")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    for _ in range(3):
        df = df.groupBy((F.col("id") % 10).alias("id")).agg(F.sum("v").alias("v"))
    out = materialize(df, ck)
    # The materialized plan must be a scan of checkpointed blocks, not the
    # three-round aggregation chain.
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan
    assert "Aggregate" not in plan


def test_materialize_all_concurrent_independent_frames(spark, tmp_path):
    from kafka_clickhouse_example_spark.operators.checkpointing import (
        materialize_all,
    )

    frames = [
        spark.range(50).groupBy((F.col("id") % k).alias("g")).count()
        for k in (3, 5, 7)
    ]
    outs = materialize_all(frames)
    # input order preserved, lineage cut on every frame
    for k, out in zip((3, 5, 7), outs):
        assert out.count() == k
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan
        assert "Aggregate" not in plan
    # reliable variant configures the dir once and still lands blocks
    ck = str(tmp_path / "ma_ck")
    outs = materialize_all(
        [spark.range(10).withColumn("v", F.col("id") + 1)], reliable_dir=ck
    )
    assert outs[0].count() == 10
    assert any(Path(ck).rglob("*"))
