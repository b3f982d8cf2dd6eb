"""Shared tombstone-delete machinery for the serving indexes.

Both materialized indexes (operators/retrieval's term-bucketed postings
and operators/ann_index's cell-partitioned vector layout) complete their
"delete + re-add" update contract with the same Lucene-shaped devices;
this module is their ONE definition (review finding: the mask, guard,
append, and reset logic was duplicated verbatim across the two modules,
the exact drift risk the shared ANN scan kernels were extracted for):

- :func:`append_tombstones` — O(delta) delete: the distinct,
  actually-indexed subset of the ids lands in the ``_deletes`` side
  table. The doomed set probes the O(n) indexed-id relation with a
  BROADCAST left-semi join (big side stays map-only — the previous
  per-module shape put the O(n) relation on the probe side, forcing a
  full shuffle of it per delete).
- :func:`mask_deleted` — serving anti-join placed BEFORE any per-batch
  top-k cut, so a deleted row can never shadow a live candidate in a
  task-local prefilter slot. Broadcast is safe: compaction bounds the
  tombstone set.
- :func:`raise_if_pending_tombstone` — re-adding an id whose tombstone
  has not been compacted is refused (the tombstone would mask the new
  row), with the remedy named.
- :func:`reset_tombstones` — removes exactly the COMPACTED ids
  (anti-join), never a truncate: a tombstone appended while a long
  compaction runs must survive the reset, or its row silently
  resurfaces with no remaining trace (review finding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.sources.catalog import external_location


def mask_deleted(df: DataFrame, deletes_table: str, id_col: str) -> DataFrame:
    """Anti-join ``df`` against the tombstone set (no-op for indexes
    built before the deletes surface existed — no side table)."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(deletes_table):
        return df
    dels = spark.table(deletes_table).select(id_col)
    return df.join(F.broadcast(dels), id_col, "left_anti")


def append_tombstones(
    ids: DataFrame, deletes_table: str, indexed_table: str, id_col: str
) -> None:
    """Append the distinct, actually-indexed subset of ``ids`` into the
    tombstone table — deleting an unknown id is a no-op, not an error.
    One map-only broadcast semi-join pass over the O(n) id relation;
    re-running the same delete appends duplicate rows (semantically
    idempotent under the anti-join, deduped at compaction)."""
    spark = ids.sparkSession
    doomed = (
        spark.table(indexed_table)
        .select(id_col)
        .join(F.broadcast(ids.select(id_col).distinct()), id_col, "left_semi")
    )
    doomed.write.format("parquet").mode("append").saveAsTable(deletes_table)


def raise_if_pending_tombstone(
    ids: DataFrame, deletes_table: str, id_col: str, op: str, remedy: str
) -> None:
    """Refuse a re-add of a tombstoned id: the pending tombstone would
    mask the new row at serve time. Checked before the append-only guard
    so the error names the actual remedy (run the compaction first)."""
    spark = ids.sparkSession
    if not spark.catalog.tableExists(deletes_table):
        return
    tomb = (
        spark.table(deletes_table)
        .join(F.broadcast(ids.select(id_col).distinct()), id_col, "left_semi")
        .limit(1)
        .collect()
    )
    if tomb:
        raise ValueError(
            f"{op}: delta contains {id_col} {tomb[0][id_col]} with a "
            f"pending tombstone — run {remedy} before re-adding a "
            "deleted id"
        )


def reset_tombstones(
    spark: SparkSession, deletes_table: str, compacted: DataFrame, id_col: str
) -> None:
    """Remove exactly the ids the compaction just handled; tombstones
    appended after the compaction snapshot survive. The overwrite keeps
    a path-built side table external at its published location."""
    remaining = (
        spark.table(deletes_table)
        .join(F.broadcast(compacted), id_col, "left_anti")
        .distinct()
        .localCheckpoint(eager=True)  # self-referential overwrite rule
    )
    w = remaining.write.format("parquet").mode("overwrite")
    loc = external_location(spark, deletes_table)
    if loc is not None:
        w = w.option("path", loc)
    w.saveAsTable(deletes_table)
