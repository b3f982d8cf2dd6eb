"""Temporal join operators Spark lacks as built-ins: as-of join and banded
range join — expressed as compositions of exchange-friendly primitives
(union + window, bin + equi-join) instead of the naive non-equi joins that
nested-loop at scale.

Scale design (100 TB):

- **As-of join** (latest right row at-or-before each left row, per key): the
  naive formulation is a theta-join (``r.ts <= l.ts``) that Spark plans as
  BroadcastNestedLoopJoin — O(|L| x |R|) and fatal beyond toy sizes. The
  union+window form here is the canonical distributed shape: tag both sides,
  union, one shuffle on the key, one ordered window pass carrying the most
  recent right payload forward (``last(..., ignorenulls=True)``), keep left
  rows. Cost: a single exchange of L+R rows regardless of time overlap.
- **Banded range join** (pairs within a time band): binning the time axis at
  the band width turns the range predicate into an equi-join on the bin id
  with a bounded 2x probe fan-out, then the exact band filter runs on the
  candidates only. Candidate volume is O(rows x density), never O(rows^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row joined to the most recent
    ``right`` row of the same ``key`` with ``right.ts <= left.ts`` (NULLs
    when no prior right row exists).

    Right rows sharing the maximal timestamp are resolved to that timestamp
    (payload columns should be functionally determined by (key, ts); pass a
    unique tiebreak column through ``right_payload`` and order on it
    downstream if they are not).

    Returns the left columns + ``<col>_asof`` for each right payload column
    + ``{right_ts}_asof``.
    """
    payload = right_payload or []
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r = right.select(
        *[
            (F.col(key) if c == key else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = l.unionByName(r)
    # Right rows (is_left=0) sort before left rows at an equal timestamp, so
    # "at-or-before" includes same-instant right rows. last(ignorenulls)
    # carries the newest right payload forward within the key partition.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_is_left",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}_asof") for c in payload],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{right_ts}_asof"),
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")


def range_join_binned(
    points: DataFrame,
    band_ms: int,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Banded self range join: for every point, count the points (itself
    included) in the half-open band ``(t - band_ms, t]``.

    Bins of width ``band_ms`` make the band predicate an equi-join: a
    point's band can only intersect its own bin and the previous one, so
    the probe side explodes into exactly 2 bin keys, joins on the bin id,
    and the exact band filter prunes the candidates.
    """
    ms = F.unix_millis(F.col(ts_col))
    binned = points.select(
        F.col(id_col), F.col(ts_col), ms.alias("_ms"), (ms / band_ms).cast("long").alias("_bin")
    )
    probe = binned.select(
        F.col(id_col).alias("_pid"),
        F.col(ts_col).alias("_pts"),
        F.col("_ms").alias("_pms"),
        F.explode(F.array(F.col("_bin"), F.col("_bin") - 1)).alias("_bin"),
    )
    # The bin join is corpus x corpus through an exploded side: same rule as
    # dedup's inverted index — never let Spark broadcast it.
    cand = probe.join(
        binned.hint("shuffle_hash"),
        "_bin",
    ).filter((F.col("_ms") > F.col("_pms") - band_ms) & (F.col("_ms") <= F.col("_pms")))
    return (
        cand.groupBy(F.col("_pid").alias(id_col), F.col("_pts").alias(ts_col))
        .agg(F.count("*").alias("n_in_band"))
    )


def scd2_intervals(
    df: "DataFrame",
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> "DataFrame":
    """SCD type-2 history build: collapse a change stream into validity
    intervals — one row per (key, attribute run) with [valid_from,
    valid_to) bounds, a version number, and an is_current flag. The
    standard dimension-history shape every lakehouse lands CDC into;
    the reference's append-only sink (export_clickhouse.go:38-84) has no
    UPDATE story at all, so this is engine-native new ground.

    Change detection is null-safe (NULL attribute = a distinct state, IS
    DISTINCT FROM on both engines); consecutive equal values collapse
    into one interval.

    Scale: both windows (lag for change detection, lead+row_number for
    interval bounds) share ONE partitioning — (key) — so the whole build
    is a single hash exchange plus per-key local sorts; state per task is
    one row. No join, no global sort. At 100 TB of CDC this is the
    minimal possible shape: you cannot build ordered intervals with less
    than one key-partitioned sort.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(attr_col)).over(w)
    # first-row detection via row_number, NOT lag(ts).isNull(): a NULL ts
    # value sorts first and would make its SUCCESSOR look like a first
    # row, emitting a spurious interval (review finding — the streaming
    # CDC path can carry NULL ts; the oracle-matched query never does)
    changes = df.withColumn(
        "_is_change",
        (F.row_number().over(w) == 1) | ~F.col(attr_col).eqNullSafe(prev),
    ).filter(F.col("_is_change"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("version_no", F.row_number().over(w2).cast("bigint"))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, "version_no", attr_col, "valid_from", "valid_to", "is_current")
    )
