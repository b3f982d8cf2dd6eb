"""Contracts of the shared tombstone machinery (operators/tombstones) —
the one definition behind both indexes' delete surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.tombstones import (
    append_tombstones,
    mask_deleted,
    reset_tombstones,
)


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_mask_is_noop_without_side_table(spark):
    """Indexes built before the deletes surface existed have no _deletes
    table: the mask must pass the frame through untouched."""
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    assert mask_deleted(df, "tomb_never_created_deletes", "k") is df


def test_append_keeps_only_indexed_ids_and_reset_spares_late_tombstones(spark):
    """append_tombstones lands only the distinct, actually-indexed subset
    (deleting an unknown id is a no-op); reset_tombstones removes exactly
    the compacted ids — a tombstone appended AFTER the compaction
    snapshot (simulated here by a second append) must survive the reset,
    or its row would silently resurface with no remaining trace."""
    try:
        spark.range(0, 10).select(F.col("id").alias("k")).write.mode(
            "overwrite"
        ).saveAsTable("tomb_ids_t")
        spark.range(0, 10).select(F.col("id").alias("k")).limit(0).write.mode(
            "overwrite"
        ).saveAsTable("tomb_del_t")

        # ids 3, 4 are indexed; 99 is not; 3 appears twice in the request
        req = spark.createDataFrame([(3,), (4,), (99,), (3,)], "k long")
        append_tombstones(req, "tomb_del_t", "tomb_ids_t", "k")
        assert sorted(r.k for r in spark.table("tomb_del_t").collect()) == [3, 4]

        # compaction snapshots {3, 4}; a "mid-compaction" delete of 7 lands
        snapshot = spark.table("tomb_del_t").localCheckpoint(eager=True)
        append_tombstones(
            spark.createDataFrame([(7,)], "k long"),
            "tomb_del_t",
            "tomb_ids_t",
            "k",
        )
        reset_tombstones(spark, "tomb_del_t", snapshot, "k")
        assert [r.k for r in spark.table("tomb_del_t").collect()] == [7]

        # masking uses whatever is currently tombstoned
        live = mask_deleted(
            spark.table("tomb_ids_t"), "tomb_del_t", "k"
        ).collect()
        assert sorted(r.k for r in live) == [0, 1, 2, 3, 4, 5, 6, 8, 9]
    finally:
        _drop(spark, "tomb_ids_t", "tomb_del_t")
