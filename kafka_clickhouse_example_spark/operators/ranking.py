"""Distributed exact global ranking — the operator behind ORDER-BY window
functions (row_number / ntile over the whole relation) without the
single-partition window Spark would otherwise plan.

``Window.orderBy(...)`` with no partitionBy collapses the entire relation
into ONE task — the textbook 100 TB failure. The classic distributed
alternative: range-exchange + in-partition sort, O(P) per-partition counts
prefix-summed on the driver, then rank = partition offset + local position.

That two-pass skeleton lives in exactly ONE place —
``operators/packing.stream_offsets_with_total`` (the general weighted
form) — and global rank is its weight=1 specialization: an exclusive
prefix count of ones is rank-1. ntile follows arithmetically from
(rank, N). Determinism requires a total sort order — callers must include
a unique tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.packing import (
    stream_offsets_with_total,
)

_RANK_W = "_rank_w"
_RANK_OFF = "_rank_off"


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
    # Reserved internal names (plus packing's _pid, checked there): fail
    # with the real cause instead of an opaque duplicate-column error or a
    # silently-corrupted rank (ADVICE r5).
    clashes = {_RANK_W, _RANK_OFF, rank_col} & set(df.columns)
    if clashes:
        raise ValueError(
            "with_global_rank/ntile: input already has reserved column(s) "
            f"{sorted(clashes)} — rename them (or choose another rank_col)"
        )
    offset_df, total = stream_offsets_with_total(
        df.withColumn(_RANK_W, F.lit(1).cast("long")),
        weight_col=_RANK_W,
        order_cols=order_cols,
        offset_col=_RANK_OFF,
        num_partitions=num_partitions,
    )
    ranked = offset_df.withColumn(
        rank_col, (F.col(_RANK_OFF) + F.lit(1)).cast("long")
    ).drop(_RANK_W, _RANK_OFF)
    return ranked, total


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
    if tile_col in df.columns:
        raise ValueError(
            f"with_global_ntile: input already has column {tile_col!r} — "
            "rename it or choose another tile_col"
        )
    ranked, total = _ranked_with_total(df, order_cols, "_rnk", num_partitions)
    big, rem = divmod(total, n)  # rem tiles of size big+1, then size big
    pivot = rem * (big + 1)
    r0 = F.col("_rnk") - 1  # 0-based
    tile = F.when(r0 < pivot, F.floor(r0 / (big + 1))).otherwise(
        rem + F.floor((r0 - pivot) / F.greatest(F.lit(big), F.lit(1)))
    )
    return ranked.withColumn(tile_col, (tile + 1).cast("int")).drop("_rnk")
