"""User-behavior analytics over events: ordered funnel, cohort retention,
and a fixed-width value histogram.

Engine-portability rules: every piece of date arithmetic runs on millisecond
epochs (``unix_millis`` / ``epoch_ms``) with integer division — no
calendar/timezone math to diverge between engines; all counts are pinned
BIGINT.

Scale design (100 TB): the funnel chains per-user first-occurrence
aggregates (each a user_id-keyed groupBy — one shuffle key reused
throughout); cohort retention is a distinct-count over (cohort, offset)
after a user-keyed join; the histogram is a scan-parallel bucket expression
with a 10-row aggregate. Nothing materializes per-event state on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

WEEK_MS = 7 * 86_400_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_compute_table(spark, sf_dir, "events")


@register(
    "events_user_funnel",
    oracle="""
WITH su AS (
  SELECT user_id, min(ts) AS s FROM events WHERE event_type = 'signup' GROUP BY 1
),
vw AS (
  SELECT e.user_id, min(e.ts) AS v
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts >= su.s
  GROUP BY 1
),
pu AS (
  SELECT e.user_id, min(e.ts) AS p
  FROM events e JOIN vw ON vw.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= vw.v
  GROUP BY 1
)
SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM su
UNION ALL
SELECT '2_view', CAST(count(*) AS BIGINT) FROM vw
UNION ALL
SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM pu
ORDER BY stage
""",
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup -> view -> purchase, in timestamp
    order): each stage keeps users whose first qualifying event is at or
    after their previous stage's first event — sequence matching expressed
    as chained first-occurrence aggregates instead of a per-user sort.

    Single-scan plan: three chained per-user windows (no ORDER BY — plain
    per-partition aggregates) compute each user's stage timestamps over ONE
    user_id exchange of ONE events scan; the oracle's chained-CTE form
    would instead scan events once per stage. One distinct-user aggregate
    and a 1-row stack reshape finish it.
    """
    from pyspark.sql import Window

    events = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    staged = (
        events.select("user_id", "event_type", "ts")
        .withColumn(
            "s", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "v",
            F.min(
                F.when(
                    (F.col("event_type") == "view") & (F.col("ts") >= F.col("s")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("v")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    counts = staged.agg(
        F.count_distinct(F.when(F.col("s").isNotNull(), F.col("user_id"))).alias("n1"),
        F.count_distinct(F.when(F.col("v").isNotNull(), F.col("user_id"))).alias("n2"),
        F.count_distinct(F.when(F.col("p").isNotNull(), F.col("user_id"))).alias("n3"),
    )
    return (
        counts.select(
            F.expr(
                "stack(3, '1_signup', n1, '2_view', n2, '3_purchase', n3)"
                " AS (stage, n_users)"
            )
        )
        .orderBy("stage")
    )


@register(
    "events_cohort_retention",
    oracle=f"""
WITH first_signup AS (
  SELECT user_id, min(epoch_ms(ts)) AS s_ms
  FROM events WHERE event_type = 'signup' GROUP BY 1
)
SELECT CAST(f.s_ms // {WEEK_MS} AS BIGINT) AS cohort_week,
       CAST((epoch_ms(e.ts) - f.s_ms) // {WEEK_MS} AS BIGINT) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM events e JOIN first_signup f ON f.user_id = e.user_id
WHERE epoch_ms(e.ts) >= f.s_ms
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-signup week, activity
    bucketed by whole weeks since that signup, distinct active users per
    (cohort, offset) cell.

    All week arithmetic is integer division on millisecond epochs —
    identical on any engine, no calendar functions. The events⋈cohort join
    and the distinct-count both shuffle on user_id-derived keys; the result
    is (#cohorts x #offsets) rows regardless of event volume.
    """
    events = _events(spark, sf_dir)
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_millis("ts")).alias("s_ms"))
    )
    e_ms = F.unix_millis("ts")
    return (
        events.join(first_signup, "user_id")
        .filter(e_ms >= F.col("s_ms"))
        # `div` = exact integer division, the same op as DuckDB's `//` —
        # no double quotient in the bucket math.
        .groupBy(
            F.expr(f"s_ms div {WEEK_MS}").cast("long").alias("cohort_week"),
            F.expr(f"(unix_millis(ts) - s_ms) div {WEEK_MS}")
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


HIST_WIDTH = 50.0
HIST_BUCKETS = 10


@register(
    "events_value_histogram",
    oracle=f"""
SELECT least(CAST(floor(value / {HIST_WIDTH}) AS BIGINT), {HIST_BUCKETS - 1}) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1
ORDER BY bucket
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width 50, last bucket open-ended): the bucket
    id is a pure scan-parallel expression, the aggregate is 10 rows — the
    degenerate-cheap shape a histogram should be at any scale. Data-derived
    bounds would need a pre-pass; fixed bounds keep it single-scan.
    """
    events = _events(spark, sf_dir)
    bucket = F.least(
        F.floor(F.col("value") / HIST_WIDTH).cast("long"),
        F.lit(HIST_BUCKETS - 1),
    )
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bucket")
    )
