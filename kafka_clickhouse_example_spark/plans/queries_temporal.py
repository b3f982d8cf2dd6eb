"""Temporal join queries over events: as-of join and banded range join —
the time-series operators Spark has no built-in for (see
operators/temporal.py for the exchange-friendly formulations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)
from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_table

BAND_MS = 3_600_000  # 1 hour: ~14 events/band at sf0.01 density


@register(
    "events_asof_last_signup",
    oracle="""
SELECT event_id, user_id, ts, signup_ts,
       epoch_ms(ts) - epoch_ms(signup_ts) AS ms_since_signup
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         (SELECT max(s.ts) FROM events s
          WHERE s.event_type = 'signup'
            AND s.user_id = e.user_id
            AND s.ts <= e.ts) AS signup_ts
  FROM events e
  WHERE e.event_type = 'purchase'
)
ORDER BY event_id
""",
)
def events_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's most recent
    signup at-or-before it (NULL when the purchase precedes every signup —
    the fixture's users re-signup, making this a real backward search).

    The union+window plan shuffles each side once on user_id; the oracle's
    correlated max() subquery is the semantic spec, not the scalable plan.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(purchases, signups, key="user_id")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("signup_ts"),
        (F.unix_millis("ts") - F.unix_millis("ts_asof")).alias("ms_since_signup"),
    ).orderBy("event_id")


@register(
    "events_recent_activity_count",
    oracle=f"""
WITH e AS (SELECT event_id, ts, epoch_ms(ts) AS ms FROM events)
SELECT a.event_id AS event_id, a.ts AS ts, count(*) AS n_in_band
FROM e a JOIN e b ON b.ms > a.ms - {BAND_MS} AND b.ms <= a.ms
GROUP BY a.event_id, a.ts
ORDER BY 1
""",
)
def events_recent_activity_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: per event, how many events (itself included)
    landed in the trailing hour. Bin + equi-join + exact filter — candidate
    volume O(rows x band density); the oracle's direct theta-join is the
    semantic spec (DuckDB plans it as an IEJoin)."""
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    return range_join_binned(events, BAND_MS).orderBy("event_id")


@register(
    "events_time_weighted_avg",
    oracle="""
WITH o AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS vc,
         epoch_ms(ts) AS tms,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_tms
  FROM events
),
seg AS (
  SELECT user_id, vc, next_tms - tms AS dur_ms
  FROM o WHERE next_tms IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(dur_ms) AS BIGINT) AS total_ms,
       CAST(CAST(sum(vc * dur_ms) AS DOUBLE)
            / (CAST(sum(dur_ms) AS DOUBLE) * 100.0) AS DOUBLE) AS twa_value
FROM seg
GROUP BY user_id
HAVING sum(dur_ms) > 0
ORDER BY user_id
""",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each event's value is held
    until the user's next event (step-function integral / total time) —
    the correct average for irregularly-sampled series, where the plain
    mean over-weights bursts.

    Exactness: value→cents (BIGINT via DECIMAL, same rule as the outlier
    gate), durations are integer ms, so the integral Σ(v·Δt) is a BIGINT
    sum — order-independent; ONE double division at the end. The lead()
    window is total-ordered by (ts, event_id).

    Scale: one shuffle on user_id shared by the window and the groupBy —
    Spark reuses the partitioning, so the second aggregation is
    exchange-free. Cent-ms products hold to ~10⁵ value·years per user in
    BIGINT.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            (F.col("value").cast("decimal(10,2)") * 100).cast("long").alias("vc"),
            F.unix_millis(F.col("ts")).alias("tms"),
        )
        .withColumn("next_tms", F.lead("tms").over(w))
    )
    seg = o.filter(F.col("next_tms").isNotNull()).select(
        "user_id", "vc", (F.col("next_tms") - F.col("tms")).alias("dur_ms")
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("dur_ms").alias("total_ms"),
            (
                F.sum(F.col("vc") * F.col("dur_ms")).cast("double")
                / (F.sum("dur_ms").cast("double") * F.lit(100.0))
            )
            .cast("double")
            .alias("twa_value"),
        )
        .filter(F.col("total_ms") > 0)
        .orderBy("user_id")
    )


@register(
    "events_scd2_type_history",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         (lag(ts) OVER w IS NULL
          OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS is_change
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(row_number() OVER w2 AS BIGINT) AS version_no,
       event_type,
       ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       lead(ts) OVER w2 IS NULL AS is_current
FROM marked WHERE is_change
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version_no
""",
)
def events_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history from the event stream: per user, the
    validity intervals of each event_type run — [valid_from, valid_to)
    bounds, version numbers, is_current on the open interval
    (operators/temporal.scd2_intervals). ONE hash exchange on user_id
    feeds both windows; no join, no global sort (final ORDER BY is the
    deterministic gate).
    """
    from kafka_clickhouse_example_spark.operators.temporal import scd2_intervals

    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    return scd2_intervals(
        events, ["user_id"], "event_type", "ts", tiebreak_cols=["event_id"]
    ).orderBy("user_id", "version_no")


@register(
    "events_pit_state_at_purchase",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         (lag(ts) OVER w IS NULL
          OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS is_change
  FROM events WHERE event_type <> 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
history0 AS (
  SELECT user_id,
         CAST(row_number() OVER w2 AS BIGINT) AS version_no,
         event_type, ts AS valid_from,
         lead(ts) OVER w2 AS valid_to
  FROM marked WHERE is_change
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
-- zero-length intervals (two changes at the same ts) never describe the
-- state AT any instant; dropping them leaves valid_from unique per user,
-- so the as-of resolve and this equality join are both deterministic
history AS (
  SELECT * FROM history0
  WHERE valid_to IS NULL OR valid_to > valid_from
),
pit AS (
  SELECT p.event_id, p.user_id, p.ts,
         (SELECT max(h.valid_from) FROM history h
          WHERE h.user_id = p.user_id AND h.valid_from <= p.ts) AS state_since
  FROM events p WHERE p.event_type = 'purchase'
)
SELECT pit.event_id, pit.user_id, pit.ts,
       h.event_type AS state_at_ts, pit.state_since,
       h.version_no AS state_version
FROM pit
LEFT JOIN history h
  ON h.user_id = pit.user_id AND h.valid_from = pit.state_since
ORDER BY event_id
""",
)
def events_pit_state_at_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against SCD2 history: for every purchase event,
    the user's activity STATE (last non-purchase event-type interval)
    active at purchase time — the feature-store correctness primitive
    (features as-of the label's timestamp, never after it; the temporal
    sibling of the dedup family's split-leakage audit). Composes the two
    operators end-to-end: scd2_intervals builds the history,
    asof_join resolves each fact to the interval containing its ts (an
    interval table has no gaps, so newest valid_from <= ts IS the
    containing interval; facts before the first interval get NULLs).
    Zero-length intervals — two state changes at the same timestamp —
    are dropped before the resolve: they describe the state AT no
    instant, and keeping them would leave duplicate valid_from keys
    whose as-of winner is shuffle-order-dependent (review finding).

    Scale: history build = one exchange (see scd2_intervals); the PIT
    resolve = asof_join's single union-exchange on user_id with one
    carried payload row per task. No interval explosion, no range join.
    """
    from kafka_clickhouse_example_spark.operators.temporal import (
        asof_join,
        scd2_intervals,
    )

    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    history = (
        scd2_intervals(
            events.filter(F.col("event_type") != "purchase"),
            ["user_id"],
            "event_type",
            "ts",
            tiebreak_cols=["event_id"],
        )
        .filter(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
        .select("user_id", "version_no", "event_type", "valid_from")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    pit = asof_join(
        purchases,
        history,
        key="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_payload=["event_type", "version_no"],
    )
    return pit.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_type_asof").alias("state_at_ts"),
        F.col("valid_from_asof").alias("state_since"),
        F.col("version_no_asof").alias("state_version"),
    ).orderBy("event_id")
