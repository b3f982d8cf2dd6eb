"""Idempotent batch backfill: dynamic partition overwrite into a
partitioned parquet table.

The streaming spine is exactly-once via checkpointed foreachBatch; the
BATCH side of a 100 TB pipeline needs the same property for reprocessing —
re-running yesterday's job must replace yesterday's output, not append a
second copy, and must not touch any other day. Spark's dynamic partition
overwrite (`partitionOverwriteMode=dynamic`) gives that: `overwrite` mode
rewrites ONLY the partitions present in the incoming DataFrame.

Scale notes:
- The overwrite granularity is the partition directory — pick partition
  columns whose daily/affected set is what a backfill naturally recomputes
  (day, day+lang). One job rewrites O(affected partitions), never the
  table.
- The write itself is a normal distributed parquet write; no driver-side
  data movement. Committing is file-level rename within each partition
  directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write ``df`` into the partitioned parquet table at ``path``,
    replacing exactly the partitions present in ``df`` (dynamic partition
    overwrite) and leaving every other partition untouched. Re-running
    the same input is a no-op on the table's content — the idempotency
    contract backfills rely on.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
