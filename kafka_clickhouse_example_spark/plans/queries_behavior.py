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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_table

WEEK_MS = 7 * 86_400_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return load_table(spark, sf_dir, "events")


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


DAY_MS = 86_400_000
Q30 = 1 << 30  # shared Q30 fixed-point scale (see verify notes: exact
# cross-engine float aggregation = floor(v * 2^30) summed as BIGINT)


@register(
    "events_dau_wau_mau",
    oracle="""
WITH daily AS (
  SELECT DISTINCT epoch_ms(ts) // 86400000 AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM daily),
dau AS (SELECT d, count(DISTINCT user_id) AS n FROM daily GROUP BY d),
wau AS (
  SELECT days.d, count(DISTINCT daily.user_id) AS n
  FROM days JOIN daily ON daily.d BETWEEN days.d - 6 AND days.d
  GROUP BY days.d
),
mau AS (
  SELECT days.d, count(DISTINCT daily.user_id) AS n
  FROM days JOIN daily ON daily.d BETWEEN days.d - 27 AND days.d
  GROUP BY days.d
)
SELECT strftime(epoch_ms(days.d * 86400000), '%Y-%m-%d') AS day,
       CAST(dau.n AS BIGINT) AS dau,
       CAST(wau.n AS BIGINT) AS wau,
       CAST(mau.n AS BIGINT) AS mau,
       round(CAST(dau.n AS DOUBLE) / mau.n, 4) AS stickiness
FROM days JOIN dau USING (d) JOIN wau USING (d) JOIN mau USING (d)
ORDER BY day
""",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily / weekly / monthly active users with the DAU/MAU stickiness
    ratio — the standard engagement panel.

    Scale design: raw events first collapse to the DISTINCT (day, user)
    relation — the only pass over the 100 TB input, a single shuffle on a
    compact key. Rolling distinct counts then EXPLODE each (day, user) row
    into the 7 / 28 observation days it contributes to and count distinct
    per day; the explode runs over days x users rows (not events), so the
    7x/28x fan-out is bounded by the active-user matrix, never the event
    volume. Day arithmetic is integer epoch-days (no calendar math); the
    day axis is emitted as a STRING (DATE columns are hash-dead
    cross-engine, see verify notes).

    The (day, user) relation is computed once per run even though
    dau/wau/mau all branch from it: every branch reads the same canonical
    distinct-Exchange, so ReuseExchange executes the raw-events scan and
    the (day, user) shuffle a single time inside one job (r11: the former
    localCheckpoint bought the same single-scan guarantee for an extra
    per-run materialization job).
    """
    events = _events(spark, sf_dir)
    daily = (
        events.select(
            F.expr(f"unix_millis(ts) div {DAY_MS}").alias("d"), "user_id"
        ).distinct()
    )
    days = daily.select("d").distinct()
    dau = daily.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))

    def rolling(width: int, name: str) -> DataFrame:
        exploded = daily.select(
            F.explode(F.sequence(F.col("d"), F.col("d") + (width - 1))).alias("d"),
            "user_id",
        )
        # inner join to observed days: windows never extend past the data
        return (
            exploded.join(days, "d")
            .groupBy("d")
            .agg(F.countDistinct("user_id").alias(name))
        )

    out = (
        dau.join(rolling(7, "wau"), "d")
        .join(rolling(28, "mau"), "d")
        .select(
            F.date_format(F.timestamp_millis(F.col("d") * DAY_MS), "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.round(F.col("dau").cast("double") / F.col("mau"), 4).alias("stickiness"),
        )
    )
    return out.orderBy("day")


@register(
    "events_attribution_last_touch",
    oracle="""
WITH carried AS (
  SELECT event_type, ts, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER w AS src_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
           OVER w AS src_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
attributed AS (
  SELECT CASE WHEN src_ts IS NOT NULL
                   AND epoch_ms(ts) - epoch_ms(src_ts) <= 7 * 86400000
              THEN src_type ELSE 'direct' END AS channel,
         CAST(floor(CAST(value AS DOUBLE) * 1073741824) AS BIGINT) AS v_q30
  FROM carried WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(CAST(sum(v_q30) AS DOUBLE) / 1073741824, 4) AS attributed_value
FROM attributed GROUP BY channel ORDER BY channel
""",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the user's
    most recent preceding non-purchase event within a 7-day lookback, else
    'direct'.

    Scale design: ONE window pass per user (the same user_id shuffle key the
    rest of the behavior family reuses) carries the last touch forward;
    there is no self-join of purchases against touches. src_type and src_ts
    are carried as two IGNORE NULLS columns nulled by the SAME predicate, so
    they always come from the same source row. Revenue sums use the Q30
    fixed-point convention (exact integer partials -> order-independent,
    hash-stable cross-engine).
    """
    events = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    carried = events.select(
        "event_type",
        "ts",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("src_type"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("src_ts"),
    )
    attributed = carried.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("src_ts").isNotNull()
            & (F.unix_millis("ts") - F.unix_millis("src_ts") <= 7 * DAY_MS),
            F.col("src_type"),
        )
        .otherwise("direct")
        .alias("channel"),
        F.floor(F.col("value").cast("double") * Q30).cast("bigint").alias("v_q30"),
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.round(F.sum("v_q30").cast("double") / Q30, 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


_DECAY_LAGS = 16  # window depth: weights 2^-1 .. 2^-16 (sum < 1, exact)


def _decay_terms_sql() -> str:
    terms = []
    for j in range(_DECAY_LAGS):
        w = 1 << (_DECAY_LAGS - 1 - j)
        terms.append(f"coalesce(lag(v_q30, {j}) OVER w, 0) * {w}")
    return " + ".join(terms)


@register(
    "events_decayed_value_sum",
    oracle=f"""
WITH purchases AS (
  SELECT event_id, user_id, ts,
         CAST(floor(CAST(value AS DOUBLE) * 1073741824) AS BIGINT) AS v_q30
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, user_id,
       round(CAST(({_decay_terms_sql()}) AS DOUBLE) / {1 << 46}, 6) AS decayed_value
FROM purchases
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
)
def events_decayed_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed purchase-value sum per user (EWMA-style
    smoothing, alpha = 1/2) computed EXACTLY: binary weights 2^-(j+1) over
    the last 16 purchases as integer Q30 arithmetic — no float recursion, no
    cross-engine rounding drift. s_i = sum_j v[i-j] * 2^-(j+1), expressed as
    16 lag() terms scaled by 2^(15-j) over one window pass, then one exact
    power-of-two descale to double.

    Scale design: a single user-partitioned window (bounded 16-row state per
    row in the worst case for lag chains); integer partial products stay
    under 2^59 so BIGINT never overflows at any row count (the bound is
    per-row, not per-group).
    """
    events = _events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * Q30).cast("bigint").alias("v_q30"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    acc = None
    for j in range(_DECAY_LAGS):
        weight = 1 << (_DECAY_LAGS - 1 - j)
        term = F.coalesce(F.lag("v_q30", j).over(w), F.lit(0)) * weight
        acc = term if acc is None else acc + term
    return purchases.select(
        "event_id",
        "user_id",
        F.round(acc.cast("double") / (1 << 46), 6).alias("decayed_value"),
    ).orderBy("event_id")


@register(
    "events_session_paths",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800000 THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM ordered
),
paths AS (
  SELECT array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 5), '>') AS path
  FROM sessions GROUP BY user_id, session_no
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
""",
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session paths: sessionize per user (30-minute gap, the house
    convention), take each session's first five event types as a '>'-joined
    path, and rank paths by frequency — the product-analytics 'common
    journeys' report.

    Scale design: gaps-and-islands via two window passes on the one
    user_id shuffle key; per-session lists are collected AFTER grouping to
    (user, session) — bounded by slice(5) only at projection, but session
    length is data-bounded (a session is minutes, not the corpus); the
    final path rollup is a tiny aggregate + TakeOrdered(20).
    """
    events = _events(spark, sf_dir)
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = (
        F.when(
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w_order)) > 1_800_000,
            1,
        )
        .otherwise(0)
        .alias("new_session")
    )
    sessions = events.select("user_id", "ts", "event_id", "event_type", new_session).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session")
        .over(w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    paths = (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("ts", "event_id", "event_type"))
                        ),
                        lambda s: s.getField("event_type"),
                    ),
                    1,
                    5,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@register(
    "events_cohort_ltv",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(epoch_ms(ts)) AS first_ms FROM events GROUP BY user_id
),
purchases AS (
  SELECT e.user_id,
         f.first_ms // 604800000 AS cohort_week,
         (epoch_ms(e.ts) - f.first_ms) // 604800000 AS week_offset,
         CAST(floor(CAST(e.value AS DOUBLE) * 1073741824) AS BIGINT) AS v_q30
  FROM events e JOIN firsts f USING (user_id)
  WHERE e.event_type = 'purchase'
),
cohort_sizes AS (
  SELECT first_ms // 604800000 AS cohort_week,
         CAST(count(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY cohort_week
)
SELECT CAST(p.cohort_week AS BIGINT) AS cohort_week,
       CAST(p.week_offset AS BIGINT) AS week_offset,
       cs.cohort_users,
       round(CAST(sum(p.v_q30) AS DOUBLE) / 1073741824, 4) AS revenue,
       round(CAST(sum(p.v_q30) AS DOUBLE) / 1073741824 / cs.cohort_users, 4)
         AS revenue_per_user
FROM purchases p JOIN cohort_sizes cs ON p.cohort_week = cs.cohort_week
GROUP BY p.cohort_week, p.week_offset, cs.cohort_users
ORDER BY cohort_week, week_offset
""",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: revenue per (first-seen week, weeks
    since first seen), absolute and per cohort user — the revenue sibling
    of events_cohort_retention (which counts active users). Q30 fixed-point
    revenue partials keep the sums exact and order-independent; week
    arithmetic is integer epoch math.

    Scale: one user-keyed first-seen aggregate, one user-keyed join (the
    behavior family's single shuffle key), then a (cohort x offset)-sized
    rollup with map-side partials.
    """
    events = _events(spark, sf_dir)
    ms = F.unix_millis("ts")
    firsts = events.groupBy("user_id").agg(F.min(ms).alias("first_ms"))
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            F.expr("first_ms div 604800000").alias("cohort_week"),
            F.expr("(unix_millis(ts) - first_ms) div 604800000").alias("week_offset"),
            F.floor(F.col("value").cast("double") * Q30).cast("bigint").alias("v_q30"),
        )
    )
    cohort_sizes = firsts.groupBy(
        F.expr("first_ms div 604800000").alias("cohort_week")
    ).agg(F.count("*").cast("bigint").alias("cohort_users"))
    return (
        purchases.groupBy("cohort_week", "week_offset")
        .agg(F.sum("v_q30").alias("s"))
        .join(F.broadcast(cohort_sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            F.col("week_offset").cast("bigint").alias("week_offset"),
            "cohort_users",
            F.round(F.col("s").cast("double") / Q30, 4).alias("revenue"),
            F.round(
                F.col("s").cast("double") / Q30 / F.col("cohort_users"), 4
            ).alias("revenue_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_conversion_ab_test",
    oracle="""
WITH assignment AS (
  SELECT user_id, user_id % 2 AS grp,
         CASE WHEN min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
                   <= min(epoch_ms(ts)) + 86400000
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
g AS (
  SELECT CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_a,
         CAST(sum(converted) FILTER (WHERE grp = 0) AS BIGINT) AS c_a,
         CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_b,
         CAST(sum(converted) FILTER (WHERE grp = 1) AS BIGINT) AS c_b
  FROM assignment
)
SELECT n_a, c_a, n_b, c_b,
       round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
       round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
       round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / nullif(sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
                    * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 0), 4)
         AS z_score
FROM g
""",
)
def events_conversion_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on 24-hour purchase conversion between a
    deterministic A/B assignment (user parity stands in for the bucketing
    hash a real experiment uses): pooled-variance z from EXACT per-arm
    user and converter counts — the experimentation readout. Conversion =
    first purchase within 24h of the user's first event (a rate strictly
    inside (0,1) on this corpus — an everyone-converts metric degenerates
    the pooled variance to zero, which the NULLIF guard also handles).
    Every input to the z formula is an exact integer and the formula is
    one fixed chain of double ops, so the statistic is bit-stable
    cross-engine.

    Scale: one user-keyed aggregate (the behavior family's shuffle key)
    then a 1-row reduction; nothing depends on event volume beyond the
    first rollup.
    """
    events = _events(spark, sf_dir)
    ms = F.unix_millis("ts")
    assignment = (
        events.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "purchase", ms)).alias("first_p"),
            F.min(ms).alias("first_ms"),
        )
        .select(
            (F.col("user_id") % 2).alias("grp"),
            F.when(F.col("first_p") <= F.col("first_ms") + 86_400_000, 1)
            .otherwise(0)
            .alias("converted"),
        )
    )
    g = assignment.agg(
        F.count_if(F.col("grp") == 0).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted"))).cast("bigint").alias("c_a"),
        F.count_if(F.col("grp") == 1).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted"))).cast("bigint").alias("c_b"),
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    denom = F.sqrt(
        pooled
        * (1 - pooled)
        * (F.lit(1).cast("double") / F.col("n_a") + F.lit(1).cast("double") / F.col("n_b"))
    )
    z = (ra - rb) / F.nullif(denom, F.lit(0.0))
    return g.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
    )


@register(
    "events_survival_km",
    oracle="""
WITH users AS (
  SELECT user_id,
         min(epoch_ms(ts)) AS first_ms,
         max(epoch_ms(ts)) AS last_ms
  FROM events GROUP BY user_id
),
bounds AS (SELECT max(epoch_ms(ts)) AS obs_end FROM events),
lived AS (
  SELECT (last_ms - first_ms) // 86400000 AS t,
         CASE WHEN last_ms <= bounds.obs_end - 86400000 THEN 1 ELSE 0 END AS died
  FROM users, bounds
),
risk AS (
  SELECT t,
         CAST(sum(died) AS BIGINT) AS d,
         CAST((SELECT count(*) FROM lived l2 WHERE l2.t >= l1.t) AS BIGINT) AS n
  FROM lived l1 GROUP BY t
  HAVING sum(died) > 0
),
factors AS (
  SELECT t, d, n,
         1 - CAST(d AS DOUBLE) / n AS f,
         row_number() OVER (ORDER BY t) AS i
  FROM risk
),
packed AS (SELECT list(f ORDER BY t) AS fs FROM factors)
SELECT factors.t AS lifetime_days, factors.n AS n_at_risk, factors.d AS n_churned,
       round(list_reduce(list_prepend(CAST(1 AS DOUBLE), packed.fs[1:factors.i]),
                         (acc, x) -> acc * x), 6) AS survival
FROM factors, packed
ORDER BY lifetime_days
""",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user lifetime (days from first to
    last activity): users quiet for the trailing day count as churned
    ('deaths'); users still active at observation end are right-censored
    and only contribute to the at-risk denominators — the product-limit
    estimator, the standard churn-curve statistic.

    Exactness: d and n are exact integers; each hazard factor is one
    double division, and every survival value is an ORDER-PINNED fold
    (prefix product over the t-sorted factor list, the same deterministic
    fold as chi2/centroid-drift — no pow/exp/log). The curve has one row
    per distinct death lifetime (bounded by observed days, never user
    count), so the O(k^2) prefix folds run over a list of at most a few
    thousand elements regardless of corpus size.

    Scale: one user-keyed aggregate, one day-keyed rollup, then
    single-row list math.
    """
    events = _events(spark, sf_dir)
    ms = F.unix_millis("ts")
    users = events.groupBy("user_id").agg(
        F.min(ms).alias("first_ms"), F.max(ms).alias("last_ms")
    )
    bounds = events.agg(F.max(ms).alias("obs_end"))
    lived = users.crossJoin(F.broadcast(bounds)).select(
        F.expr("(last_ms - first_ms) div 86400000").alias("t"),
        F.when(F.col("last_ms") <= F.col("obs_end") - 86_400_000, 1)
        .otherwise(0)
        .alias("died"),
    )
    per_t = lived.groupBy("t").agg(
        F.sum("died").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("ended_here"),
    )
    # at-risk n(t) = users with lifetime >= t: suffix sum over the compact
    # per-day rollup via an ORDER BY t DESC running total
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d", F.sum("ended_here").over(w).cast("bigint").alias("n")
    ).filter(F.col("d") > 0)
    factors = risk.select(
        "t",
        "d",
        "n",
        (F.lit(1) - F.col("d").cast("double") / F.col("n")).alias("f"),
    )
    packed = factors.groupBy().agg(
        F.collect_list(F.struct("t", "d", "n", "f")).alias("cells")
    ).select(F.array_sort("cells").alias("cells"))
    exploded = packed.select(
        F.posexplode("cells").alias("pos", "cell"), F.col("cells")
    )
    survival = F.aggregate(
        F.transform(
            F.slice(F.col("cells"), 1, F.col("pos") + 1),
            lambda s: s.getField("f"),
        ),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return exploded.select(
        F.col("cell.t").alias("lifetime_days"),
        F.col("cell.n").alias("n_at_risk"),
        F.col("cell.d").alias("n_churned"),
        F.round(survival, 6).alias("survival"),
    ).orderBy("lifetime_days")
