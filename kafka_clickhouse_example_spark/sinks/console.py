"""Console + parquet sinks (reference parity S5, SURVEY.md §2.1).

The reference's stdout exporter prints each *raw* JSON map pre-projection
(pkg/stdout/export_stdout.go:12-27, noted in SURVEY §2.1 S5: the full map,
unlike the ClickHouse path which projects to 12 columns). ``start_console``
therefore takes whichever frame the caller wants visible — raw or
normalized — and prints it, preserving that asymmetry as a caller choice.

``start_parquet`` is the self-contained durable sink (SURVEY §7 Phase 2):
partitioned by ingest date so at 100 TB the table prunes on time, the
overwhelmingly dominant predicate for flow logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_console(df: DataFrame, *, truncate: bool = False, num_rows: int = 20):
    """S5: writeStream.format("console") ≙ fmt.Println per row."""
    return (
        df.writeStream.format("console")
        .option("truncate", str(truncate).lower())
        .option("numRows", str(num_rows))
        .start()
    )


def start_parquet(
    flows: DataFrame,
    path: str,
    checkpoint_dir: str,
    *,
    partition_by_day: bool = True,
    trigger_available_now: bool = False,
):
    """Durable columnar sink: append-only parquet, day-partitioned on the
    flow start time so readers prune partitions on time predicates."""
    out = flows
    partition_cols: list[str] = []
    if partition_by_day:
        out = out.withColumn(
            "ingest_date",
            F.to_date(F.timestamp_seconds(F.floor(F.col("start") / 1000).cast("long"))),
        )
        partition_cols = ["ingest_date"]
    q = out.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint_dir
    )
    if partition_cols:
        q = q.partitionBy(*partition_cols)
    if trigger_available_now:
        q = q.trigger(availableNow=True)
    return q.start()
