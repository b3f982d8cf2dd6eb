"""Distributed exact global ranking — the operator behind ORDER-BY window
functions (row_number / ntile over the whole relation) without the
single-partition window Spark would otherwise plan.

``Window.orderBy(...)`` with no partitionBy collapses the entire relation
into ONE task — the textbook 100 TB failure. The classic distributed
alternative implemented here:

1. ``repartitionByRange`` on the sort key (range exchange — the same
   machinery as a global ``orderBy``, sampled boundaries, scales with
   executor count) + ``sortWithinPartitions``.
2. Count rows per partition (a cheap aggregate whose result is one row per
   partition — P rows, not data rows).
3. Collect the P partition counts to the driver (bounded by cluster
   parallelism, never by data), prefix-sum them into start offsets.
4. ``mapInPandas``: within each already-sorted partition, global rank =
   partition start offset + local position; ntile follows arithmetically
   from (rank, N).

Two passes over the data, both scan-parallel; driver state is O(P).
Determinism requires a total sort order — callers must include a unique
tiebreak column.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense global row number ordered by ``order_cols``
    (which must be a total order — include a unique tiebreak)."""
    return _ranked_with_total(df, order_cols, rank_col, num_partitions)[0]


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    # Materialize the range-partitioned sort ONCE: the boundary sampling in
    # repartitionByRange is not stable across job executions, so running the
    # count job and the rank job against the lazy plan can see different
    # partitionings — offsets from one, positions from the other. The
    # checkpoint is the two-pass algorithm's intermediate, not a cache
    # nicety. (At cluster scale: persist(MEMORY_AND_DISK) between passes.)
    ranged = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # One row per partition — O(P) driver state, not O(rows).
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ranged.drop("_pid").schema.add(rank_col, "long")

    def rank_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            start = offsets[int(pdf["_pid"].iloc[0])] + pos
            pdf = pdf.drop(columns=["_pid"])
            pdf[rank_col] = range(start + 1, start + 1 + len(pdf))
            pos += len(pdf)
            yield pdf

    return ranged.mapInPandas(rank_partition, schema=out_schema), acc


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without a
    single-partition window.

    SQL ntile semantics: the first ``N % n`` tiles get ``ceil(N/n)`` rows,
    the rest ``floor(N/n)`` — derived arithmetically from the global rank,
    so the result is bit-identical to the window-function definition.
    """
    ranked, total = _ranked_with_total(df, order_cols, "_rnk", num_partitions)
    big, rem = divmod(total, n)  # rem tiles of size big+1, then size big
    pivot = rem * (big + 1)
    r0 = F.col("_rnk") - 1  # 0-based
    tile = F.when(r0 < pivot, F.floor(r0 / (big + 1))).otherwise(
        rem + F.floor((r0 - pivot) / F.greatest(F.lit(big), F.lit(1)))
    )
    return ranked.withColumn(tile_col, (tile + 1).cast("int")).drop("_rnk")
