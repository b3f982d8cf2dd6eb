"""Time-series reshaping over events: hypertable-style gap-filled rollup,
pivot (long->wide), and CUBE grouping — the continuous-aggregate surface a
time-series store layers over its hourly buckets.

Scale design (100 TB): every query here aggregates FIRST (hourly/daily
buckets — cardinality is the time range, not the row count) and reshapes the
small post-agg relation. The gap-fill spine (sequence + explode) and the
LOCF window run over #buckets rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_hourly_gapfill",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
bounds AS (
  SELECT min(date_trunc('hour', ts)) AS mn, max(date_trunc('hour', ts)) AS mx
  FROM events
),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM bounds
)
SELECT s.hour AS hour,
       coalesce(h.n_events, 0) AS n_events,
       coalesce(h.sum_value, 0.0) AS sum_value,
       last_value(h.sum_value IGNORE NULLS)
         OVER (ORDER BY s.hour ROWS UNBOUNDED PRECEDING) AS sum_value_locf
FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
ORDER BY hour
""",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup (timescale-style ``time_bucket_gapfill``):
    aggregate to hour buckets, generate the dense hour spine over the
    observed range (sequence + explode of ONE row), left-join, zero-fill,
    and carry the last observed value forward (LOCF).

    The spine bounds come from the full events relation while the rollup is
    purchase-only, so real gaps exist and both fill modes are exercised.
    The LOCF window is ordered over the spine — #hours rows, safe as a
    single partition at any data scale (a year is 8,760 rows).
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    spine = (
        events.agg(
            F.min(F.date_trunc("hour", "ts")).alias("mn"),
            F.max(F.date_trunc("hour", "ts")).alias("mx"),
        )
        .select(
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(hourly, "hour", "left")
        .select(
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_locf"),
        )
        .orderBy("hour")
    )


@register(
    "events_type_day_pivot",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  {", ".join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY 1
ORDER BY day
""",
)
def events_type_day_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot: one row per day, one count column per event type.

    The value list is explicit, so Spark skips the extra distinct-values
    job and the plan is a single partial-aggregated groupBy — pivot on an
    unbounded-cardinality column would instead make one column per distinct
    value (schema explosion); bounding it is the operator's scale contract.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return pivoted.select(
        "day", *[F.coalesce(t, F.lit(0)).alias(t) for t in EVENT_TYPES]
    ).orderBy("day")


@register(
    "events_type_day_cube",
    oracle="""
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE(event_type, date_trunc('day', ts))
ORDER BY event_type NULLS FIRST, day NULLS FIRST
""",
)
def events_type_day_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, day): all four grouping sets in one pass —
    Catalyst expands the cube into a single Expand + partial aggregate, so
    the input is scanned once; the 4x row expansion happens pre-shuffle on
    already-reduced partials.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.cube(F.col("event_type"), F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first()
        )
    )


@register(
    "events_user_trailing_hour",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER trail AS DOUBLE) AS trailing_sum,
       CAST(count(*) OVER trail AS BIGINT)                          AS trailing_n
FROM events
WINDOW trail AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                 RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def events_user_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-hour rolling aggregate via a RANGE window frame —
    the time-based sliding aggregate (vs the ROWS frames elsewhere).

    Both engines order the frame on millisecond epoch (``unix_millis`` /
    ``epoch_ms``), not raw timestamps, so the inclusive 1-hour boundary is
    evaluated on identical integers — sub-millisecond timestamp precision
    can't disagree between engines. Partitioned by user_id: shuffles once,
    no global sort; the frame sum is DECIMAL so sliding accumulation is
    exact.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    trail = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(trail)
            .cast("double")
            .alias("trailing_sum"),
            F.count("*").over(trail).alias("trailing_n"),
        )
        .orderBy("event_id")
    )


@register(
    "events_incremental_rollup_merge",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
       CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
""",
)
def events_incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the day×type rollup is
    computed as TWO partial rollups — a 'historical' slice and a 'new
    ingest' slice (split on event_id parity, standing in for
    already-rolled-up state vs today's arrivals) — merged by re-aggregating
    the partials (sum-of-sums, sum-of-counts, min-of-mins, max-of-maxes).

    The oracle is the PLAIN full-table rollup, so a hash match certifies
    the merge algebra itself: merge(agg(A), agg(B)) ≡ agg(A ∪ B). DECIMAL
    partials make the certification exact — the merge must hold bit-for-bit,
    not approximately.

    Scale: this is the maintenance path that replaces an O(history) daily
    recompute with O(delta) + O(|view|): the historical side would be the
    stored view at 100 TB (|days×types| rows), only the delta scans raw
    data.
    """
    configure_runtime(spark)
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    vdec = F.col("value").cast("decimal(18,2)")

    def partial(df: DataFrame) -> DataFrame:
        return df.select(day, "event_type", vdec.alias("v")).groupBy(
            "day", "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )

    hist = partial(ev.filter(F.col("event_id") % 2 == 0))
    delta = partial(ev.filter(F.col("event_id") % 2 == 1))
    return (
        hist.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").cast("double").alias("sum_value"),
            F.min("min_v").cast("double").alias("min_value"),
            F.max("max_v").cast("double").alias("max_value"),
        )
        .select("day", "event_type", "n", "sum_value", "min_value", "max_value")
        .orderBy("day", "event_type")
    )


@register(
    "events_dow_hour_heatmap",
    oracle="""
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY dow, hour_of_day
ORDER BY dow, hour_of_day
""",
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the seasonality matrix every
    ops dashboard starts with. Cross-engine calendar pitfall pinned in
    the oracle: DuckDB's dayofweek is 0-based Sunday, Spark's is 1-based
    Sunday, so the oracle adds 1 and both emit Spark's convention.

    Scale: 7×24 = 168 groups — partial aggregation reduces any scan to
    168 rows per partition before the shuffle; the derived keys are pure
    scan-stage expressions (no pre-shuffle).
    """
    configure_runtime(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("dow", "hour_of_day")
    )


@register(
    "events_intraday_value_bands",
    oracle="""
WITH c AS (
  SELECT CAST(hour(ts) AS BIGINT) AS hh,
         CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
  FROM events
),
g AS (SELECT hh, cents, count(*) AS cnt FROM c GROUP BY 1, 2),
w AS (
  SELECT hh, cents, cnt,
         sum(cnt) OVER (PARTITION BY hh ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY hh) AS n
  FROM g
)
SELECT hh, CAST(max(n) AS BIGINT) AS n_events,
       max(CASE WHEN cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum
                THEN cents END) AS p50_cents,
       max(CASE WHEN cum - cnt < (19 * n + 19) // 20 AND (19 * n + 19) // 20 <= cum
                THEN cents END) AS p95_cents,
       max(CASE WHEN cum - cnt < (99 * n + 99) // 100 AND (99 * n + 99) // 100 <= cum
                THEN cents END) AS p99_cents
FROM w GROUP BY hh ORDER BY hh
""",
)
def events_intraday_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday value profile: EXACT p50/p95/p99 per hour-of-day, computed
    the way exact grouped percentiles survive 100 TB — never sorting rows
    within a group. Rows collapse to (hour, cents) frequency counts first
    (the exchange carries distinct values, ~50k cents cells per group max,
    regardless of row count); a cumulative sum over each group's VALUE
    histogram then finds the order statistic by crossing (cum−cnt < k ≤
    cum with k = ceil(q·n) as integer arithmetic). Compare ranking.py's
    range-exchange ntile: same philosophy, histogram instead of sort.
    Cents go through DECIMAL(10,2) so 6.55 → 655 exactly (the
    events_value_outliers convention)."""
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    c = events.select(
        F.hour("ts").cast("long").alias("hh"),
        (F.col("value").cast("decimal(10,2)") * 100).cast("long").alias("cents"),
    )
    g = c.groupBy("hh", "cents").agg(F.count("*").alias("cnt"))
    wcum = Window.partitionBy("hh").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("hh")
    w = g.select(
        "hh",
        "cents",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def pick(knum: str) -> F.Column:
        k = F.expr(knum)
        return F.max(
            F.when((F.col("cum") - F.col("cnt") < k) & (k <= F.col("cum")), F.col("cents"))
        )

    return (
        w.groupBy("hh")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            pick("(n + 1) div 2").alias("p50_cents"),
            pick("(19 * n + 19) div 20").alias("p95_cents"),
            pick("(99 * n + 99) div 100").alias("p99_cents"),
        )
        .orderBy("hh")
    )


@register(
    "events_hourly_autocorrelation",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS h, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, h
),
paired AS (
  SELECT a.event_type, a.n AS x, b.n AS y
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND b.h = a.h + 1
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM paired GROUP BY event_type
)
SELECT event_type, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS lag1_autocorr
FROM s
ORDER BY event_type
""",
)
def events_hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly event-count series per type —
    the burstiness/periodicity signal a capacity planner reads. Pearson
    over consecutive-hour count pairs with EXACT integer moment sums
    (counts are integers; the only doubles are the final fixed chain), so
    the result is bit-stable across engines and partitionings.

    Scale: events collapse to the (type, hour) rollup first — cardinality
    is the time range — and the consecutive-hour self-join runs on that
    compact relation, not on raw events. Missing hours simply contribute no
    pair (gap semantics, mirrored in the oracle join).
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "event_type", F.expr("unix_millis(ts) div 3600000").alias("h")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    paired = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.h") == F.col("a.h") + 1),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("x"),
        F.col("b.n").alias("y"),
    )
    # moment sums in DECIMAL (DuckDB: HUGEINT): n*sxx etc. would overflow a
    # LONG once hourly counts reach ~1e7 at full scale — same widening rule
    # as orders_price_lines_correlation. Widen BEFORE multiplying (the
    # oracle's CAST(x AS HUGEINT) * x): x*x in LONG already overflows at
    # those counts and ANSI mode would throw before the cast ran.
    dec = "decimal(27,0)"
    s = paired.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select(
        "event_type",
        "n",
        F.round(num / (denx * deny), 6).alias("lag1_autocorr"),
    ).orderBy("event_type")


@register(
    "events_value_benford",
    oracle="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
  FROM events
  WHERE floor(CAST(value AS DOUBLE) * 100) >= 1
),
counts AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
),
total AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
SELECT d AS first_digit, n,
       round(CAST(n AS DOUBLE) / t, 6) AS observed_p,
       round(log10(1.0 + CAST(1 AS DOUBLE) / d), 6) AS benford_p
FROM counts, total
ORDER BY first_digit
""",
)
def events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of the value column — the classic
    fabricated-data / instrumentation-bug screen: observed first-digit
    shares next to the Benford expectation log10(1 + 1/d).

    Integer extraction (cents via the shared floor(v*100) op, first digit
    via string head) keeps counting exact; log10 on the 9 constant
    ratios is the only libm call and is evaluated identically by both
    engines on identical rational inputs. Scale: map + 9-row aggregate.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value").cast("double") * 100).cast("bigint")
    digits = events.select(vc.alias("vc")).filter(F.col("vc") >= 1).select(
        F.substring(F.col("vc").cast("string"), 1, 1).cast("int").alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").cast("bigint").alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("d").alias("first_digit"),
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("observed_p"),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0).cast("double") / F.col("d")), 6).alias("benford_p"),
        )
        .orderBy("first_digit")
    )


@register(
    "events_revenue_trend_ols",
    oracle="""
WITH daily AS (
  SELECT epoch_ms(ts) // 86400000 AS d,
         sum(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS rev_c
  FROM events WHERE event_type = 'purchase' GROUP BY d
),
x AS (
  SELECT d - (SELECT min(d) FROM daily) AS t, rev_c FROM daily
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(t AS HUGEINT))          AS st,
         sum(CAST(t AS HUGEINT) * t)      AS stt,
         sum(CAST(rev_c AS HUGEINT))      AS sy,
         sum(CAST(t AS HUGEINT) * rev_c)  AS sty
  FROM x
)
SELECT n,
       round((CAST(n AS DOUBLE) * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
             / 100, 4) AS slope_per_day,
       round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) * CAST(st AS DOUBLE))
             / CAST(n AS DOUBLE) / 100, 4) AS intercept
FROM s
""",
)
def events_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS trend of daily purchase revenue: slope and intercept
    from exact integer moment sums (normal equations), one fixed double
    chain at the end — no iterative fitting, no float accumulators, same
    recipe as the correlation/moments family. Day index is zero-based from
    the observed minimum so the sums stay small.

    Scale: one rollup to #days rows, one 1-row moment aggregate over it.
    Moment sums run in DECIMAL (HUGEINT in the oracle): t*rev_c reaches
    ~1e16 per day-row at full scale and sums past LONG.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.expr("unix_millis(ts) div 86400000").alias("d"))
        .agg(
            F.sum(F.floor(F.col("value").cast("double") * 100).cast("bigint")).alias(
                "rev_c"
            )
        )
    )
    dmin = daily.agg(F.min("d").alias("mn"))
    x = daily.crossJoin(F.broadcast(dmin)).select(
        (F.col("d") - F.col("mn")).alias("t"), "rev_c"
    )
    # widen-then-multiply (the oracle's CAST(t AS HUGEINT) * rev_c): at the
    # full-scale domain in the docstring t*rev_c exceeds int64 BEFORE a
    # cast-after-multiply could widen it, throwing under ANSI mode
    dec = "decimal(27,0)"
    s = x.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("t").cast(dec)).alias("st"),
        F.sum(F.col("t").cast(dec) * F.col("t")).alias("stt"),
        F.sum(F.col("rev_c").cast(dec)).alias("sy"),
        F.sum(F.col("t").cast(dec) * F.col("rev_c")).alias("sty"),
    )
    n = F.col("n").cast("double")
    st = F.col("st").cast("double")
    stt = F.col("stt").cast("double")
    sy = F.col("sy").cast("double")
    sty = F.col("sty").cast("double")
    slope = (n * sty - st * sy) / (n * stt - st * st)
    return s.select(
        "n",
        F.round(slope / 100, 4).alias("slope_per_day"),
        F.round((sy - slope * st) / n / 100, 4).alias("intercept"),
    )


@register(
    "events_seasonal_naive_backtest",
    oracle="""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, d
),
paired AS (
  SELECT a.event_type, a.n AS actual, b.n AS forecast
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.d = a.d - 7
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(sum(abs(actual - forecast)) AS DOUBLE) / count(*), 4) AS mae,
       round(CAST(sum(abs(actual - forecast)) AS DOUBLE) / sum(actual), 6) AS wape
FROM paired GROUP BY event_type
ORDER BY event_type
""",
)
def events_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict today = same
    weekday last week) on daily counts per type: MAE and weighted absolute
    percentage error, all-integer until two final divisions. The honest
    baseline every fancier forecaster must beat — and the error metric
    pipeline is the reusable part.

    Scale: rollup to (type, day), self-join on the compact rollup at
    lag 7 — cardinality is the time range, never the event count.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count("*").cast("bigint").alias("n"))
    a = daily.alias("a")
    b = daily.alias("b")
    paired = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") == F.col("a.d") - 7),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("actual"),
        F.col("b.n").alias("forecast"),
    )
    err = F.abs(F.col("actual") - F.col("forecast"))
    return (
        paired.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(F.sum(err).cast("double") / F.count("*"), 4).alias("mae"),
            F.round(F.sum(err).cast("double") / F.sum("actual"), 6).alias("wape"),
        )
        .orderBy("event_type")
    )


@register(
    "events_wow_growth",
    oracle="""
WITH weekly AS (
  SELECT event_type, epoch_ms(ts) // 604800000 AS wk,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, wk
),
g AS (
  SELECT event_type, wk, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev
  FROM weekly
)
SELECT event_type, CAST(wk AS BIGINT) AS wk, n,
       round((n - prev) * 100.0 / prev, 4) AS growth_pct
FROM g WHERE prev IS NOT NULL
ORDER BY event_type, wk
""",
)
def events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the standard BI trend panel.
    Counts exact; the growth percentage is one double division on
    identical integers, so it is hash-stable. The lag window runs on the
    weekly rollup (cardinality = weeks x types), never on raw events.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        "event_type", F.expr("unix_millis(ts) div 604800000").alias("wk")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("wk")
    g = weekly.withColumn("prev", F.lag("n").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return g.select(
        "event_type",
        F.col("wk").cast("bigint").alias("wk"),
        "n",
        F.round((F.col("n") - F.col("prev")) * 100.0 / F.col("prev"), 4).alias(
            "growth_pct"
        ),
    ).orderBy("event_type", "wk")


@register(
    "events_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, d
),
o AS (
  SELECT event_type, d, n,
         row_number() OVER w AS t,
         sum(n) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS big_t,
         sum(n) OVER (PARTITION BY event_type) AS s_total
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
),
scored AS (
  SELECT event_type, d,
         abs(big_t * s_t - t * s_total) AS stat,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(big_t * s_t - t * s_total) DESC, d) AS rn,
         big_t, s_total
  FROM o
)
SELECT event_type,
       strftime(epoch_ms(d * 86400000), '%Y-%m-%d') AS change_day,
       CAST(stat AS BIGINT) AS cusum_stat,
       round(CAST(stat AS DOUBLE) / (CAST(big_t AS DOUBLE) * s_total), 6)
         AS normalized
FROM scored WHERE rn = 1
ORDER BY event_type
""",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event type: the day t maximizing
    |T·S_t − t·S_total| — the integer-scaled form of the classic
    cumulative-deviation-from-mean statistic (multiplying through by T
    avoids the mean's division entirely, so detection is EXACT and the
    argmax tiebreak deterministic).

    Scale: raw events collapse to the daily rollup first; every window
    here runs per event type over #days rows (a decade is ~3.7k rows per
    type) — bounded state regardless of event volume. T·S_t stays under
    int64 to ~1e4 days x 1e12 events.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.expr("unix_millis(ts) div 86400000").alias("d")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w_ord = Window.partitionBy("event_type").orderBy("d")
    w_all = Window.partitionBy("event_type")
    o = daily.select(
        "event_type",
        "d",
        F.row_number().over(w_ord).alias("t"),
        F.sum("n")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("s_t"),
        F.count("*").over(w_all).cast("bigint").alias("big_t"),
        F.sum("n").over(w_all).alias("s_total"),
    )
    stat = F.abs(F.col("big_t") * F.col("s_t") - F.col("t") * F.col("s_total"))
    scored = o.select(
        "event_type",
        "d",
        stat.alias("stat"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(stat.desc(), "d"))
        .alias("rn"),
        "big_t",
        "s_total",
    )
    return (
        scored.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format(F.timestamp_millis(F.col("d") * 86_400_000), "yyyy-MM-dd").alias("change_day"),
            F.col("stat").cast("bigint").alias("cusum_stat"),
            F.round(
                F.col("stat").cast("double")
                / (F.col("big_t").cast("double") * F.col("s_total")),
                6,
            ).alias("normalized"),
        )
        .orderBy("event_type")
    )


@register(
    "events_type_day_unpivot",
    oracle=f"""
WITH wide AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    {", ".join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
  FROM events GROUP BY 1
)
{" UNION ALL ".join(f"SELECT day, '{t}' AS event_type, {t} AS n FROM wide" for t in EVENT_TYPES)}
ORDER BY day, event_type
""",
)
def events_type_day_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-type day matrix back to long form —
    pivot's inverse, certifying Spark's native unpivot semantics (column
    names become values, one output row per (id, measure) cell) against a
    UNION ALL expansion oracle.

    Scale: unpivot is a zero-shuffle Expand over the already-tiny wide
    rollup; the round trip pivot->unpivot is metadata reshaping, not data
    movement.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .select("day", *[F.coalesce(t, F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES])
    )
    return (
        wide.unpivot("day", EVENT_TYPES, "event_type", "n")
        .select("day", "event_type", F.col("n").cast("bigint").alias("n"))
        .orderBy("day", "event_type")
    )


@register(
    "events_user_interarrival",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_ms
  FROM events
)
SELECT event_type,
       CAST(count(gap_ms) AS BIGINT) AS n_gaps,
       round(CAST(quantile_cont(gap_ms, 0.5) AS DOUBLE) / 1000, 4) AS median_gap_s,
       round(CAST(sum(gap_ms) AS DOUBLE) / count(gap_ms) / 1000, 4) AS mean_gap_s,
       CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
FROM gaps WHERE gap_ms IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def events_user_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type, measured WITHIN each
    user's own stream — the burstiness profile capacity planning reads.
    Gaps are integer milliseconds (exact median via the integer-midpoint
    trick; the mean is one double division of exact sums).

    Scale: the lag window partitions on (user_id, event_type) — bounded
    per-partition state on the behavior family's user key, deliberately
    NOT a global per-type ordering (one partition per type would be the
    classic window skew cliff at full scale).
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    gaps = events.select(
        "event_type", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_ms").cast("bigint").alias("n_gaps"),
            F.round(F.percentile("gap_ms", F.lit(0.5)).cast("double") / 1000, 4).alias(
                "median_gap_s"
            ),
            F.round(
                F.sum("gap_ms").cast("double") / F.count("gap_ms") / 1000, 4
            ).alias("mean_gap_s"),
            F.max("gap_ms").cast("bigint").alias("max_gap_ms"),
        )
        .orderBy("event_type")
    )
