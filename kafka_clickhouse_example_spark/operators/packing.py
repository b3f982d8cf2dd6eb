"""Sequence packing: map each document onto the global token stream a
trainer would see after concat-and-split batching.

GPT-style pretraining concatenates the corpus into one token stream and
slices it into fixed-length context windows; a document therefore occupies
the half-open token span [start_offset, start_offset + n_tokens) and
touches chunks floor(start/ctx) .. floor((start + n_tokens - 1)/ctx).
Knowing each document's span is what makes chunk-level provenance,
curriculum ordering, and "which docs straddle a boundary" questions
answerable without tokenizing twice.

The core is an exact distributed prefix sum — the same two-pass shape as
operators/ranking.py (which prefix-sums row COUNTS; this generalizes to an
arbitrary weight column):

1. Range-exchange on the order key + in-partition sort, materialized once
   (repartitionByRange boundary sampling is not stable across jobs — the
   checkpoint IS the algorithm's intermediate, not a cache nicety).
2. One aggregate row per partition (sum of weights) -> O(P) driver state,
   prefix-summed into partition start offsets.
3. mapInPandas: within each sorted partition, a vectorized cumulative sum
   plus the partition offset gives every row its exact global offset.

Two scan-parallel passes, no single-partition window anywhere; at 100 TB
the only serial state is P partial sums on the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_CONTEXT = 512


def with_stream_offsets(
    df: DataFrame,
    weight_col: str,
    order_cols: list[str],
    offset_col: str = "start_offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact exclusive prefix sum of ``weight_col`` over the total order
    ``order_cols`` (must include a unique tiebreak), distributed."""
    return stream_offsets_with_total(
        df, weight_col, order_cols, offset_col, num_partitions
    )[0]


def stream_offsets_with_total(
    df: DataFrame,
    weight_col: str,
    order_cols: list[str],
    offset_col: str = "start_offset",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """The two-pass prefix-sum skeleton, returning (DataFrame, grand
    total). This is THE one implementation — operators/ranking.py's
    global rank/ntile are this with weight=1 (round-4 deferred refactor
    B unified the two previously lock-step copies)."""
    # Reserved internal names: a clash would surface as an opaque
    # duplicate-column / wrong-dtype error deep in the Arrow exchange (or
    # silently corrupt the offsets via the wrong `_pid`) — name the real
    # problem up front instead (ADVICE r5; same style as the null-weight
    # diagnostic below).
    clashes = {"_pid", offset_col} & set(df.columns)
    if clashes:
        raise ValueError(
            "with_stream_offsets: input already has reserved column(s) "
            f"{sorted(clashes)} — rename them or pass a different offset_col"
        )
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = {
        r["_pid"]: r["w"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum(F.col(weight_col)).cast("long").alias("w"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    out_schema = ranged.drop("_pid").schema.add(offset_col, "long")

    def offset_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carried = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            start = offsets[int(pdf["_pid"].iloc[0])] + carried
            if pdf[weight_col].isna().any():
                # a null weight becomes NaN in pandas and poisons every
                # subsequent cumsum offset in the partition, surfacing as
                # an opaque Arrow cast error far from the cause — name the
                # real problem instead (review finding)
                raise ValueError(
                    f"with_stream_offsets: null {weight_col!r} in input — "
                    "fill or filter null weights before packing"
                )
            w = pdf[weight_col].to_numpy()
            csum = w.cumsum()
            pdf = pdf.drop(columns=["_pid"])
            pdf[offset_col] = start + csum - w  # exclusive prefix
            carried += int(csum[-1])
            yield pdf

    return ranged.mapInPandas(offset_partition, schema=out_schema), acc


def with_pack_chunks(
    df: DataFrame,
    weight_col: str = "n_tokens",
    order_cols: list[str] | None = None,
    ctx: int = PACK_CONTEXT,
) -> DataFrame:
    """Add start_offset / first_chunk / last_chunk / n_chunks for
    concat-and-split packing at context length ``ctx``.

    Zero-weight rows are pinned to their boundary chunk (span is empty;
    last = first) via greatest(w, 1) in the end-offset arithmetic.
    """
    order_cols = order_cols or ["doc_id"]
    out = with_stream_offsets(df, weight_col, order_cols)
    start = F.col("start_offset")
    end_incl = start + F.greatest(F.col(weight_col).cast("long"), F.lit(1)) - 1
    return (
        out.withColumn("first_chunk", F.floor(start / ctx).cast("long"))
        .withColumn("last_chunk", F.floor(end_incl / ctx).cast("long"))
        .withColumn(
            "n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1).cast("long")
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    order_cols: list[str] | None = None,
) -> int:
    """Write ``df`` as fixed-size training shards: every output file holds
    at most ``rows_per_shard`` rows (``maxRecordsPerFile`` enforces the cap
    inside each task; the repartition count keeps files near-full rather
    than fragmenting), optionally in a stable global order — the shard
    layout a data loader streams with predictable memory per shard.
    Returns the number of shard files written.

    Scale: one repartition (range if ordered, round-robin otherwise); the
    writer splits at the row cap without any driver-side accounting.
    """
    import math

    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    # materialize once: count() + write would otherwise execute the full
    # upstream plan twice (and size shards from a different run than the
    # one written) — same rationale as with_stream_offsets above
    df = df.localCheckpoint(eager=True)
    n_rows = df.count()
    n_parts = max(1, math.ceil(n_rows / rows_per_shard))
    if order_cols:
        out = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        out = out.sortWithinPartitions(*order_cols)
    else:
        out = df.repartition(n_parts)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )
    # count shards via the Hadoop FS (local glob is wrong for hdfs://,
    # s3a://, or file: URI paths — the compact_to_target lesson)
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return sum(
        1
        for st in fs.listStatus(hpath)
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    )
