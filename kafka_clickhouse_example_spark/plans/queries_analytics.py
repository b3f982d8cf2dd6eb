"""The analytics layer (SURVEY.md §2.3-2.7, §7 Phase 3).

The reference delegates every analytical SELECT to ClickHouse and implements
no joins/aggregations/windows/set-ops itself; this module provides them as
engine-native DataFrame plans, each with a DuckDB oracle.

Determinism rules (driver hash gate):
- Money aggregates are summed as DECIMAL — exact integer arithmetic, so the
  result is independent of partial-aggregation order across partitions.
  Doubles summed across 32 (or 100,000) partitions would drift in the last
  bits and flake the hash.
- Averages: exact decimal sum -> cast double -> divide by count -> round —
  one deterministic double op instead of an order-dependent running mean.
- Every top-k has a total ORDER BY (unique tiebreak column included).
- FINAL OUTPUT TYPES are pinned on both engines (round-2 fix): the driver
  compares Spark toPandas() against DuckDB .df() with per-cell str(), and
  DuckDB's pandas conversion turns every DECIMAL and HUGEINT into float64.
  A Spark Decimal('138014.00') then strs as '138014.00' vs DuckDB's
  '138014.0' — value-identical, hash-dead. So every decimal aggregate is
  cast to DOUBLE as the last step on BOTH sides (the *sum itself* stays
  exact decimal; nearest-double of the same exact value is bit-identical in
  any engine), and every integer sum gets CAST(... AS BIGINT) in the oracle
  to kill DuckDB's sum(BIGINT)->HUGEINT->float64 promotion.

Scale design (100 TB):
- Dimension joins (region/nation/supplier/part) are broadcast explicitly —
  they stay KB..MB at any SF, so no shuffle of the fact side's join key.
- Fact-fact joins (orders⋈lineitem, customer⋈orders) are left to
  sort-merge + AQE (skew-split). At 100 TB these tables would be bucketed by
  orderkey on disk, making these joins shuffle-free; the plan shape here is
  unchanged by that storage decision.
- Aggregations are partial (map-side combine) by construction — groupBy over
  low-cardinality keys (returnflag, status) reduces before shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import sketches as SK
from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_tables

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    configure_runtime(spark)
    return load_tables(spark, sf_dir, list(names))


# Exact decimal arithmetic for money expressions: cast each 2-decimal FACTOR
# to decimal, then multiply. Casting the double *product* instead would hit
# engine-divergent rounding at x.xxxx5 boundaries (Spark rounds the shortest
# decimal repr, DuckDB the binary value) — with per-factor casts every
# subsequent op is exact integer math, identical on any engine and any
# partial-aggregation order.
def _disc_price():
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    one_minus_disc = (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")).cast("decimal(4,2)")
    return price * one_minus_disc


def _charge():
    one_plus_tax = (F.lit(1) + F.col("l_tax").cast("decimal(4,2)")).cast("decimal(4,2)")
    return _disc_price() * one_plus_tax


DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"
)
CHARGE_SQL = f"{DISC_PRICE_SQL} * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))"


# --- Aggregation: TPC-H Q1 shape (pricing summary) -------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)                AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)           AS sum_base_price,
  CAST(sum({DISC_PRICE_SQL}) AS DOUBLE)                                 AS sum_disc_price,
  CAST(sum({CHARGE_SQL}) AS DOUBLE)                                     AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)     AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
  count(*)                                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY aggregation with partial (map-side) combine; 6 aggregates.

    Low-cardinality group keys (~6 groups) mean the shuffle moves a few
    hundred bytes per input partition regardless of table size — this plan
    is the same at sf0.01 and at 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    sum_qty = F.sum(F.col("l_quantity").cast(DEC))
    sum_base = F.sum(F.col("l_extendedprice").cast(DEC))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.cast("double").alias("sum_qty"),
            sum_base.cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            (sum_qty.cast("double") / F.count("*")).alias("avg_qty"),
            (sum_base.cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Join + agg + top-k: TPC-H Q3 shape (shipping priority) ----------------


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT
  l.l_orderkey,
  CAST(sum({DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈orders⋈lineitem, filtered, aggregated, top-10 by revenue.

    The mktsegment filter prunes customer before the join (Catalyst pushes
    it into the scan). customer⋈orders and orders⋈lineitem stay sort-merge:
    both sides are fact-scale at 100 TB, and AQE handles orderkey skew.
    TakeOrderedAndProject handles the top-10 without a global sort.
    """
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- Multi-way join: TPC-H Q5 shape (regional supplier volume) -------------


@register(
    "q5_region_revenue",
    oracle=f"""
SELECT
  n.n_name,
  CAST(sum({DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join tree with explicit broadcasts for the dimensions.

    region/nation/supplier are broadcast (KB-scale at any SF) — the big
    fact tables never shuffle on those keys. The only real shuffles are
    customer⋈orders and orders⋈lineitem, as in Q3.
    """
    t = _t(spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --- Broadcast dimension join: TPC-H Q14 shape (promo revenue) --------------


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT
  CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {DISC_PRICE_SQL}
                             ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       / CAST(sum({DISC_PRICE_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct,
  CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {DISC_PRICE_SQL}
                ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE) AS promo_revenue,
  CAST(sum({DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue,
  count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue share): lineitem ⋈ part with the part
    dimension broadcast — closes the last uncovered join dimension of the
    star schema (VERDICT r1 'What's missing' #3).

    part is a classic dimension (KB..MB at any SF next to the lineitem
    fact): broadcasting it means the month-filtered lineitem scan never
    shuffles — the shipdate predicate lands in the parquet scan
    (PushedFilters) and the join is a map-side hash probe. Sums accumulate
    in exact DECIMAL; the ratio is a single double division at the end
    (both pinned DOUBLE on both engines — see module determinism rules).
    """
    t = _t(spark, sf_dir, "lineitem", "part")
    promo = F.when(
        F.col("p_type") == "PROMO", _disc_price()
    ).otherwise(F.lit(0).cast("decimal(17,4)"))
    agg = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(_disc_price()).cast("double").alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"))
        .cast("double")
        .alias("promo_revenue_pct"),
        "promo_revenue",
        "total_revenue",
        "n_items",
    )


# --- Semi / anti joins ------------------------------------------------------


@register(
    "q4_priority_with_big_items",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q4_priority_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): orders having at least one big line item.

    Semi join ships only the join key of the filtered probe side; the
    quantity filter lands in the parquet scan as a pushed predicate.
    """
    t = _t(spark, sf_dir, "orders", "lineitem")
    big = t["lineitem"].filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "customers_without_big_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
ORDER BY c.c_custkey
""",
)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no six-figure order."""
    t = _t(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --- Window functions -------------------------------------------------------


@register(
    "top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k per group: row_number over (custkey, price desc).

    One shuffle on o_custkey. At 100 TB this is the canonical per-key top-k;
    if custkey were skewed, pre-aggregation with a grouped top-k
    (min_by/collect+slice) would replace the window, but row_number keeps
    exact ties deterministic via the orderkey tiebreak.
    """
    orders = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "customer_order_running_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
)
def customer_order_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (cumulative spend per customer over time).

    DECIMAL accumulation keeps the running sum exact; the frame is ROWS (not
    RANGE) with a unique orderkey tiebreak so every prefix is deterministic.
    """
    orders = _t(spark, sf_dir, "orders")["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# --- Time-series over events ------------------------------------------------


@register(
    "events_hourly_rollup",
    oracle="""
SELECT date_trunc('hour', ts) AS bucket,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
""",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form of the streaming hourly
    rollup): time-bucket + type, with an exact distinct-user count.

    At 100 TB the same plan runs under Structured Streaming as
    ``window(ts, '1 hour')`` + watermark; count(DISTINCT) would become
    approx_count_distinct (oracle-incompatible, hence exact here).
    """
    events = _t(spark, sf_dir, "events")["events"]
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("bucket", "event_type")
    )


@register(
    "top_talkers",
    oracle="""
SELECT user_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 10
""",
)
def top_talkers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The natural flows analysis the reference schema implies (SURVEY.md §7
    Phase 3): heaviest users by total value — groupBy+sum+orderBy+limit."""
    events = _t(spark, sf_dir, "events")["events"]
    return (
        events.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy(F.col("total_value").desc(), "user_id")
        .limit(10)
    )


@register(
    "top_talkers_salted",
    oracle="""
SELECT user_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 10
""",
)
def top_talkers_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top_talkers via salted two-stage aggregation (operators/skew.py): the
    skew-safe plan for heavy-hitter keys. Shares top_talkers' oracle —
    salting spreads placement, never changes results (DECIMAL partials make
    the two-stage sum exact)."""
    from kafka_clickhouse_example_spark.operators.skew import salted_agg

    events = _t(spark, sf_dir, "events")["events"]
    agg = salted_agg(
        events,
        ["user_id"],
        {
            "total_value": ("value", lambda c: F.sum(F.col(c).cast(DEC)), F.sum),
            "n_events": ("value", F.count, F.sum),
        },
        salt_col=F.col("event_id"),
    )
    return agg.select(
        "user_id",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("n_events").cast("long").alias("n_events"),
    ).orderBy(F.col("total_value").desc(), "user_id").limit(10)


@register(
    "events_value_percentiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.5)  AS p50,
       quantile_cont(value, 0.9)  AS p90,
       quantile_cont(value, 0.99) AS p99,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (sort-based `percentile`, linear
    interpolation — same formula as DuckDB's quantile_cont). The approximate
    scale path is percentile_approx (rows-only below)."""
    events = _t(spark, sf_dir, "events")["events"]
    return (
        events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5D)").alias("p50"),
            F.expr("percentile(value, 0.9D)").alias("p90"),
            F.expr("percentile(value, 0.99D)").alias("p99"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@register(
    "events_value_percentiles_approx",
    oracle="""
WITH hist AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, vc,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vc
                        ROWS UNBOUNDED PRECEDING) AS c,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type,
       min(CASE WHEN c >= ceil(n * 0.5)  THEN vc END) / 100.0 AS p50,
       min(CASE WHEN c >= ceil(n * 0.9)  THEN vc END) / 100.0 AS p90,
       min(CASE WHEN c >= ceil(n * 0.99) THEN vc END) / 100.0 AS p99
FROM cum GROUP BY event_type
ORDER BY event_type
""",
)
def events_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles from a fixed-resolution histogram sketch:
    values quantize to integer cents (one exact double multiply+floor),
    the per-group histogram is the sketch — mergeable by cell-wise add,
    memory bounded by domain/resolution (56k cells for this corpus's
    [0, 560] value range), absolute error <= 0.01 by construction. The
    percentile is the inverse-CDF over the cumulative histogram (smallest
    cell whose running count reaches ceil(p*n)) — integer counts and one
    fixed double chain, so the DuckDB oracle reproduces it bit-for-bit
    (upgraded from rows-only round 6; percentile_approx — the KLL-style
    path for UNBOUNDED domains — stays accuracy-pinned in
    tests/test_sketches.py, its sketch output is engine-specific).

    Scale: groupBy(event_type, cent) reduces map-side to the bounded cell
    set; the window runs over <= cells-per-group rows, never the raw data.
    """
    events = _t(spark, sf_dir, "events")["events"]
    hist = events.groupBy(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
    ).agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.withColumn("c", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )

    def pct(p: float):
        return (
            F.min(
                F.when(F.col("c") >= F.ceil(F.col("n") * p), F.col("vc"))
            )
            / 100.0
        )

    return (
        cum.groupBy("event_type")
        .agg(
            pct(0.5).alias("p50"), pct(0.9).alias("p90"), pct(0.99).alias("p99")
        )
        .orderBy("event_type")
    )


# --- Set operations ---------------------------------------------------------


@register(
    "purchase_days_without_errors",
    oracle="""
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
FROM events WHERE event_type = 'error'
ORDER BY user_id, day
""",
)
def purchase_days_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): (user, day) pairs with a purchase
    but no error. ``subtract`` is Spark's EXCEPT DISTINCT."""
    events = _t(spark, sf_dir, "events")["events"]

    def days(etype: str) -> DataFrame:
        return events.filter(F.col("event_type") == etype).select(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        )

    return days("purchase").subtract(days("error")).orderBy("user_id", "day")


@register(
    "signup_and_purchase_users",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'signup'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
""",
)
def signup_and_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    events = _t(spark, sf_dir, "events")["events"]
    a = events.filter(F.col("event_type") == "signup").select("user_id")
    b = events.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b).orderBy("user_id")


@register(
    "high_value_union",
    oracle="""
SELECT * FROM (
  SELECT 'big_purchase' AS kind, event_id, user_id, value FROM events
  WHERE event_type = 'purchase' AND value > 250
  UNION ALL
  SELECT 'big_error' AS kind, event_id, user_id, value FROM events
  WHERE event_type = 'error' AND value > 250
) t
ORDER BY kind, event_id
""",
)
def high_value_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered branches with a discriminator column."""
    events = _t(spark, sf_dir, "events")["events"]

    def branch(etype: str, kind: str) -> DataFrame:
        return (
            events.filter((F.col("event_type") == etype) & (F.col("value") > 250))
            .select(
                F.lit(kind).alias("kind"),
                "event_id",
                "user_id",
                "value",
            )
        )

    return (
        branch("purchase", "big_purchase")
        .unionAll(branch("error", "big_error"))
        .orderBy("kind", "event_id")
    )


@register(
    "user_session_windows",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  -- event_id tiebreak matches the lag() ordering above: with duplicate
  -- (user_id, ts) at a session boundary an un-tiebroken running sum could
  -- assign the 0-flag row to the previous session (ADVICE r1).
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def user_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via Spark's native
    ``session_window`` — the dynamic-gap window Structured Streaming also
    uses. The oracle derives identical sessions with the classic
    gaps-and-islands construction (lag -> boundary flag -> running sum),
    certifying Spark's merge semantics, not just row counts. session_window
    end = last event + gap, mirrored as max(ts) + 30 min."""
    events = _t(spark, sf_dir, "events")["events"]
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


_KMV_EST_SQL = (
    f"CASE WHEN nh < {SK.KMV_K} THEN CAST(nh AS DOUBLE) "
    f"ELSE {float(SK.KMV_K - 1)!r} * {float(1 << 56)!r} / CAST(hk AS DOUBLE) END"
)


@register(
    "events_user_cardinality_approx",
    oracle=f"""
WITH dh AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT AS h
  FROM events
),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM dh
  ) WHERE rn <= {SK.KMV_K}
),
est AS (
  SELECT event_type, count(*) AS nh, max(h) AS hk FROM sk GROUP BY event_type
),
n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
)
SELECT n.event_type,
       CAST(floor({_KMV_EST_SQL}) AS BIGINT) AS approx_users,
       n.n_events
FROM n JOIN est USING (event_type)
ORDER BY event_type
""",
)
def events_user_cardinality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-memory approximate distinct users per event type via the
    engine-portable KMV bottom-k sketch (operators/sketches.kmv_*): at
    100 TB the exact countDistinct's dedup shuffle is the bottleneck; the
    sketch reduces map-side to <= k hashes per group and estimates
    (k-1)*space/h_(k) — no libm, so the DuckDB oracle reproduces the
    estimate bit-for-bit (upgraded from rows-only round 6; the built-in
    HLL++ approx_count_distinct stays accuracy-pinned in
    tests/test_sketches.py, its estimate is engine-specific by design).
    Sketch error ~1/sqrt(k) = 9% at k=128 (sized so the sf0.01 gate
    certifies the estimator branch, not just below-k exact mode)."""
    events = _t(spark, sf_dir, "events")["events"]
    sk = SK.kmv_build_grouped(events, ["event_type"], "user_id")
    est = sk.groupBy("event_type").agg(
        F.count("*").alias("nh"), F.max("h").alias("hk")
    )
    n = events.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return (
        n.join(F.broadcast(est), "event_type")
        .select(
            "event_type",
            F.floor(SK.kmv_estimate_col(F.col("nh"), F.col("hk")))
            .cast("bigint")
            .alias("approx_users"),
            "n_events",
        )
        .orderBy("event_type")
    )


# --- Grouping sets / rollup --------------------------------------------------


@register(
    "orders_status_priority_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def orders_status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) -> (status) -> grand total."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --- Scalar function surface (F1-F4 generalized) -----------------------------


@register(
    "scalar_function_showcase",
    oracle="""
SELECT
  event_id,
  upper(event_type)                                    AS type_upper,
  substr(event_type, 1, 3)                             AS type_prefix,
  length(event_type)                                   AS type_len,
  concat(event_type, ':', CAST(user_id AS VARCHAR))    AS type_user,
  value / 10.0                                         AS value_tenth,
  CAST(floor(value) AS BIGINT)                         AS value_floor,
  abs(value - 250.0)                                   AS value_dist,
  year(ts)                                             AS y,
  month(ts)                                            AS m,
  dayofmonth(ts)                                       AS d,
  hour(ts)                                             AS h,
  CAST(epoch_ms(ts) AS BIGINT)                         AS epoch_millis,
  CASE WHEN value >= 250 THEN 'high' ELSE 'low' END    AS value_band
FROM events
ORDER BY event_id
LIMIT 500
""",
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface (generalizing §2.8 F1-F4): every
    expression is a JVM-side built-in inside whole-stage codegen."""
    events = _t(spark, sf_dir, "events")["events"]
    return (
        events.select(
            "event_id",
            F.upper("event_type").alias("type_upper"),
            F.substring("event_type", 1, 3).alias("type_prefix"),
            F.length("event_type").alias("type_len"),
            F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("type_user"),
            # raw IEEE division (no round()): the same double op on the same
            # input is bit-identical in any engine; round() is not.
            (F.col("value") / 10.0).alias("value_tenth"),
            F.floor("value").cast("long").alias("value_floor"),
            F.abs(F.col("value") - 250.0).alias("value_dist"),
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            F.unix_millis("ts").alias("epoch_millis"),
            F.when(F.col("value") >= 250, "high").otherwise("low").alias("value_band"),
        )
        .orderBy("event_id")
        .limit(500)
    )


# --- TPC-H join-shape widening (round 3): Q13 / Q18 / Q19 / Q22 -------------


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER fact join + two-level aggregation
    (orders-per-customer, then customers-per-order-count).

    Scale: the left join shuffles both sides on custkey; the first groupBy
    reuses that partitioning (no second exchange — custkey is the join key),
    and the second groupBy reduces to at most a few hundred distinct counts,
    so its shuffle is trivial. Count of a nullable join column handles the
    zero-order customers without a special case.
    """
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q18_MIN_QTY = 190


@register(
    "q18_large_volume_customers",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(q.total_qty_dec AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_MIN_QTY}
) q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join against a HAVING-filtered aggregate.

    Scale: the quantity rollup shuffles lineitem once on orderkey — the same
    key as the orders join, so AQE coalesces into one exchange; the
    surviving ~0.1% of orderkeys are broadcast into the orders scan
    (explicit hint), and the customer join shuffles only the filtered rows.
    Quantity sums are DECIMAL so the HAVING threshold is exact under any
    partial-aggregation order.
    """
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > Q18_MIN_QTY)
    )
    return (
        t["orders"]
        .join(F.broadcast(big), t["orders"].o_orderkey == big.l_orderkey)
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


Q19_BANDS = [
    ("Brand#12", 15, (1, 11)),
    ("Brand#23", 25, (10, 20)),
    ("Brand#15", 35, (20, 30)),
]


def _q19_pred_sql() -> str:
    return " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {smax}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, smax, (qlo, qhi) in Q19_BANDS
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(sum({DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_q19_pred_sql()}
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across a dimension join.

    Scale: Catalyst cannot push a cross-relation disjunction below the join,
    so the implied part-only filter (brand IN bands AND size <= max) is
    stated explicitly — it prunes the broadcast side at the scan
    (PushedFilters) without changing semantics, the classic Q19 rewrite.
    Part stays a broadcast dimension at any SF.
    """
    t = _t(spark, sf_dir, "part", "lineitem")
    part = t["part"].filter(
        F.col("p_brand").isin([b for b, _, _ in Q19_BANDS])
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= max(smax for _, smax, _ in Q19_BANDS))
    )
    cond = None
    for b, smax, (qlo, qhi) in Q19_BANDS:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )
        cond = c if cond is None else (cond | c)
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join.

    Scale: the global average is one aggregate row cross-joined in as a
    broadcast (no collect, no driver round-trip); the threshold itself is
    exact-decimal-sum -> one double divide, so the filter cuts identically
    under any partial-agg order. The anti join ships only the urgent slice
    of orders (filter pushed below the join) against the pre-filtered rich
    customers.
    """
    t = _t(spark, sf_dir, "customer", "orders")
    thr = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
            ).alias("thr")
        )
    )
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    rich = (
        t["customer"]
        .crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
    )
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- Exact global deciles without a single-partition window -----------------


@register(
    "orders_value_deciles",
    oracle="""
SELECT tile,
       CAST(count(*) AS BIGINT)   AS n_orders,
       min(o_totalprice)          AS min_price,
       max(o_totalprice)          AS max_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                                  AS avg_price
FROM (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
  FROM orders
)
GROUP BY tile
ORDER BY tile
""",
)
def orders_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact value deciles via the distributed two-pass rank operator
    (operators/ranking.py) instead of ``ntile(10) OVER (ORDER BY ...)`` —
    whose empty PARTITION BY would funnel 100 TB through ONE task.

    The range exchange + per-partition offsets reproduce SQL ntile
    semantics bit-for-bit (the oracle IS the window function); driver state
    is one count per partition. Tiebreak on o_orderkey makes the tiling
    deterministic under duplicate prices.
    """
    from kafka_clickhouse_example_spark.operators.ranking import with_global_ntile

    orders = _t(spark, sf_dir, "orders")["orders"]
    tiled = with_global_ntile(
        orders.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
        10,
    )
    return (
        tiled.groupBy("tile")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count("*")
            ).alias("avg_price"),
        )
        .orderBy("tile")
    )


# --- Semi-structured extraction (schema-on-read) ----------------------------


@register(
    "events_props_extract",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT)                                AS n_events,
       min(CAST(props->>'$.k' AS BIGINT))                      AS min_k,
       max(CAST(props->>'$.k' AS BIGINT))                      AS max_k,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT)      AS sum_k,
       CAST(count(*) FILTER (WHERE CAST(props->>'$.k' AS BIGINT) IS NULL)
            AS BIGINT)                                         AS n_missing
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON ``props`` column with a
    declared schema (``from_json``) and aggregate the extracted field — the
    ClickHouse ``JSONExtract`` / schema-on-read pattern.

    from_json with an explicit schema is a single JVM-side codegen'd parse;
    unparseable or missing fields become NULLs (counted, not dropped),
    mirroring the pipeline's log-and-drop tolerance at the field level.
    """
    t = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k bigint")["k"]
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_missing"),
        )
        .orderBy("event_type")
    )


# --- Window-function breadth (lag/lead/first/rank/percent_rank/cume_dist) ---


@register(
    "customer_order_window_showcase",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       lag(o_totalprice) OVER w                                   AS prev_price,
       lead(o_totalprice) OVER w                                  AS next_price,
       first_value(o_totalprice) OVER w                           AS first_price,
       CAST(rank() OVER prio AS BIGINT)                           AS prio_rank,
       percent_rank() OVER prio                                   AS prio_pct,
       cume_dist() OVER prio                                      AS prio_cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       prio AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
ORDER BY o_orderkey
""",
)
def customer_order_window_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface in one pass: offset functions (lag/lead),
    frame-anchored first_value, and the tie-aware rank family
    (rank/percent_rank/cume_dist over a low-cardinality sort key with real
    ties — their tie semantics are part of what the oracle certifies).

    Both windows partition by custkey, so Catalyst computes them over ONE
    exchange of the orders table; no global sort beyond the final
    presentation ORDER BY. percent_rank/cume_dist are exact integer ratios
    evaluated as single double divisions — engine-portable.
    """
    orders = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.first("o_totalprice").over(w).alias("first_price"),
            F.rank().over(prio).cast("long").alias("prio_rank"),
            F.percent_rank().over(prio).alias("prio_pct"),
            F.cume_dist().over(prio).alias("prio_cume"),
        )
        .orderBy("o_orderkey")
    )


# --- TPC-H Q15 shape: aggregate view + scalar-max equality join -------------


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum({DISC_PRICE_SQL}) AS total_revenue_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue_dec AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue_dec = (SELECT max(total_revenue_dec) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: an aggregate view joined against its own scalar max
    (the supplier(s) with peak quarterly revenue).

    The max-revenue equality compares the EXACT DECIMAL sums, not doubles —
    a double-rounded tie test could keep or drop a supplier depending on
    partial-agg order; decimal equality cannot. Q15 defines revenue as a
    VIEW consumed twice (row source + scalar max); both consumers hang off
    the view's canonical aggregation Exchange, so ReuseExchange runs the
    lineitem scan + revenue shuffle ONCE inside one job (r11: the former
    eager localCheckpoint bought the same single-scan guarantee for an
    extra per-run job). The 1-row max broadcasts.
    """
    t = _t(spark, sf_dir, "supplier", "lineitem")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("total_revenue_dec"))
    )
    max_rev = revenue.agg(F.max("total_revenue_dec").alias("max_rev"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue_dec") == F.col("max_rev"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "events_top_types_sketch",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY event_type
ORDER BY cnt DESC, event_type
LIMIT 10
""",
)
def events_top_types_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (approx_top_k): heavy hitters over the event
    stream in ONE aggregate pass with bounded state.

    Oracle-backed despite being a sketch: with maxItemsTracked (10000)
    ≥ the distinct-value count (5 event types) the sketch degenerates to
    exact counts — the deliberate regime for this certification query.
    The re-sort after explode pins tie order (the sketch's own tie order
    is unspecified). At real heavy-hitter cardinalities the same plan
    keeps its fixed memory bound and the counts become approximate; the
    exact GROUP BY alternative is events_type_day_pivot's first stage.

    Scale: sketch state is O(maxItemsTracked) per partial, merged once —
    no shuffle of the value space, unlike exact top-k over an unbounded
    key domain.
    """
    t = _t(spark, sf_dir, "events")
    sk = t["events"].agg(F.expr("approx_top_k(event_type, 10)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), "event_type")
        .limit(10)
    )


@register(
    "events_grouping_sets",
    oracle="""
SELECT CASE WHEN GROUPING(event_type) = 0 THEN 'by_type' ELSE 'by_day' END AS axis,
       event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (strftime(date_trunc('day', ts), '%Y-%m-%d')))
ORDER BY axis, event_type NULLS FIRST, day NULLS FIRST
""",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint axes in one pass): per-type and
    per-day rollups of the event stream from a single scan + Expand,
    labeled via grouping(). Completes the grouping-analytics surface next
    to ROLLUP (orders_status_priority_rollup) and CUBE
    (events_type_day_cube).

    Scale: Expand doubles scan rows (one replica per grouping set) before
    partial aggregation collapses them to |types| + |days| groups — the
    shuffle stays group-sized regardless of input rows.
    """
    t = _t(spark, sf_dir, "events")
    # day goes out as STRING: a DATE output column str()s differently
    # through Spark toPandas (date) vs DuckDB .df() (datetime64 midnight)
    # under the driver's hash — same value, dead hash.
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ev = t["events"].select("event_type", day, F.col("value"))
    return (
        ev.groupingSets([["event_type"], ["day"]], "event_type", "day")
        .agg(
            # grouping() is only valid inside the grouping-sets aggregate
            F.grouping("event_type").alias("g_type"),
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.when(F.col("g_type") == 0, "by_type").otherwise("by_day").alias("axis"),
            "event_type",
            "day",
            "n",
            "sum_value",
        )
        .orderBy("axis", F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first())
    )


@register(
    "events_value_outliers",
    oracle="""
WITH c AS (
  SELECT event_id, event_type, value,
         CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS xc
  FROM events
),
g AS (
  SELECT event_type AS g_type, count(*) AS n,
         CAST(sum(xc) AS BIGINT) AS s,
         CAST(sum(xc * xc) AS BIGINT) AS s2
  FROM c GROUP BY event_type
)
SELECT event_id, event_type, value,
       CAST(CAST(s AS DOUBLE) / (n * 100.0) AS DOUBLE) AS group_mean
FROM c JOIN g ON c.event_type = g.g_type
WHERE (n * xc - s) * (n * xc - s) > 4 * (n * s2 - s * s)
ORDER BY event_id
""",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group statistical outlier gate: events more than 2 population
    standard deviations from their type's mean value.

    The z-test is EXACT integer arithmetic in cents:
      |x − μ| > 2σ  ⇔  (n·x − S)² > 4·(n·S₂ − S²)
    with S=Σx, S₂=Σx² as BIGINT cent sums — no double mean/stddev whose
    low bits depend on partial-aggregation order, and no sqrt. The cents
    conversion goes through DECIMAL(10,2) so 6.55 → 655 exactly in both
    engines (a double multiply would land on 654.999…).

    The comparison PRODUCTS widen to DECIMAL before multiplying: dev² and
    n·S₂ grow as n²·x² ≈ n²·10⁸ at cent values ~10⁴, which exceeds 2⁶³
    already at n ≈ 3·10⁵ rows per group — Spark's non-ANSI long multiply
    would wrap silently there while DuckDB widens to HUGEINT, diverging
    cross-engine (ADVICE r2). BIGINT operands cast to DECIMAL(19,0), so
    each product is ≤ DECIMAL(38,0) and exact; the binding bound is now
    the BIGINT partial S₂ ≤ n·x², i.e. ~10¹⁰ rows/group at x~10⁴ cents —
    beyond that switch the two partial sums to DECIMAL(38,0), same plan.

    Scale: one |groups|-sized aggregate broadcast back over the scan
    (same decorrelated two-pass shape as the quality gates).
    """
    t = _t(spark, sf_dir, "events")
    c = t["events"].select(
        "event_id",
        "event_type",
        "value",
        (F.col("value").cast("decimal(10,2)") * 100).cast("long").alias("xc"),
    )
    g = c.groupBy(F.col("event_type").alias("g_type")).agg(
        F.count("*").alias("n"),
        F.sum("xc").alias("s"),
        F.sum(F.col("xc") * F.col("xc")).alias("s2"),
    )
    d19 = "decimal(19,0)"  # any BIGINT fits; product of two → DECIMAL(38,0)
    n, s, s2 = (F.col(x).cast(d19) for x in ("n", "s", "s2"))
    dev = n * F.col("xc").cast(d19) - s
    return (
        c.join(F.broadcast(g), F.col("event_type") == F.col("g_type"))
        .filter(dev * dev > F.lit(4).cast(d19) * (n * s2 - s * s))
        .select(
            "event_id",
            "event_type",
            "value",
            (F.col("s").cast("double") / (F.col("n") * F.lit(100.0)))
            .cast("double")
            .alias("group_mean"),
        )
        .orderBy("event_id")
    )


@register(
    "orders_lineitem_integrity_audit",
    oracle="""
WITH la AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT CASE WHEN la.l_orderkey IS NULL THEN 'order_without_lines'
            WHEN o.o_orderkey IS NULL THEN 'lines_without_order'
            ELSE 'ok' END AS status,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(coalesce(sum(n_lines), 0) AS BIGINT) AS n_lines
FROM orders o FULL OUTER JOIN la ON o.o_orderkey = la.l_orderkey
GROUP BY status
ORDER BY status
""",
)
def orders_lineitem_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit between the two fact tables: per-status
    key counts for orders without line items, line items without a parent
    order, and intact keys — the reconciliation report a pipeline runs
    after every load (the driver corpus really does contain 257 childless
    orders at sf0.01; the audit is not vacuous).

    Scale: lineitem collapses to a per-orderkey aggregate BEFORE the full
    outer join, so the join is keys×keys, not keys×rows; both sides
    shuffle on the same orderkey — on a bucketed layout (bucketing.py)
    the exchange disappears entirely.
    """
    t = _t(spark, sf_dir, "orders", "lineitem")
    la = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
    )
    j = t["orders"].join(la, F.col("o_orderkey") == F.col("l_orderkey"), "full_outer")
    status = (
        F.when(F.col("l_orderkey").isNull(), "order_without_lines")
        .when(F.col("o_orderkey").isNull(), "lines_without_order")
        .otherwise("ok")
    )
    return (
        j.groupBy(status.alias("status"))
        .agg(
            F.count("*").alias("n_keys"),
            F.coalesce(F.sum("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
        )
        .orderBy("status")
    )


@register(
    "orders_profile_report",
    oracle="""
WITH s AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count(*) - count(o_orderkey) AS BIGINT)      AS nulls_orderkey,
    CAST(count(DISTINCT o_orderkey) AS BIGINT)        AS nd_orderkey,
    CAST(min(o_orderkey) AS VARCHAR)                  AS min_orderkey,
    CAST(max(o_orderkey) AS VARCHAR)                  AS max_orderkey,
    CAST(count(*) - count(o_orderstatus) AS BIGINT)   AS nulls_status,
    CAST(count(DISTINCT o_orderstatus) AS BIGINT)     AS nd_status,
    CAST(min(o_orderstatus) AS VARCHAR)               AS min_status,
    CAST(max(o_orderstatus) AS VARCHAR)               AS max_status,
    CAST(count(*) - count(o_orderpriority) AS BIGINT) AS nulls_priority,
    CAST(count(DISTINCT o_orderpriority) AS BIGINT)   AS nd_priority,
    CAST(min(o_orderpriority) AS VARCHAR)             AS min_priority,
    CAST(max(o_orderpriority) AS VARCHAR)             AS max_priority
  FROM orders
)
SELECT col, n_rows, n_nulls, n_distinct, min_value, max_value FROM (
  SELECT 'o_orderkey' AS col, n_rows, nulls_orderkey AS n_nulls,
         nd_orderkey AS n_distinct, min_orderkey AS min_value,
         max_orderkey AS max_value FROM s
  UNION ALL
  SELECT 'o_orderstatus', n_rows, nulls_status, nd_status,
         min_status, max_status FROM s
  UNION ALL
  SELECT 'o_orderpriority', n_rows, nulls_priority, nd_priority,
         min_priority, max_priority FROM s
)
ORDER BY col
""",
)
def orders_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling report: per-column null count, distinct
    count, and min/max (as strings) for a column subset of orders,
    unpivoted to one row per column — the first thing a pipeline runs on
    an unfamiliar load.

    Scale: ONE aggregate pass computes every column's stats (multi-
    distinct goes through Spark's Expand); the unpivot (stack) runs on
    the single 1-row aggregate. Profiling N columns never becomes N
    scans.
    """
    t = _t(spark, sf_dir, "orders")
    o = t["orders"]

    def stats(c: str, alias: str):
        return [
            (F.count("*") - F.count(c)).alias(f"nulls_{alias}"),
            F.count_distinct(F.col(c)).alias(f"nd_{alias}"),
            F.min(F.col(c)).cast("string").alias(f"min_{alias}"),
            F.max(F.col(c)).cast("string").alias(f"max_{alias}"),
        ]

    agg = o.agg(
        F.count("*").alias("n_rows"),
        *stats("o_orderkey", "orderkey"),
        *stats("o_orderstatus", "status"),
        *stats("o_orderpriority", "priority"),
    )
    stack = F.expr(
        "stack(3, "
        "'o_orderkey', nulls_orderkey, nd_orderkey, min_orderkey, max_orderkey, "
        "'o_orderstatus', nulls_status, nd_status, min_status, max_status, "
        "'o_orderpriority', nulls_priority, nd_priority, min_priority, max_priority"
        ") AS (col, n_nulls, n_distinct, min_value, max_value)"
    )
    return (
        agg.select(F.col("n_rows"), stack)
        .select("col", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
        .orderBy("col")
    )


@register(
    "orders_price_lines_correlation",
    oracle="""
WITH ol AS (
  SELECT o.o_orderkey,
         CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc,
         CAST(count(l.l_orderkey) AS BIGINT) AS nl
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
),
s AS (
  -- sums stay HUGEINT: sum(pc*pc) ~ 4e19 overflows BIGINT even at sf0.01
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(pc) AS sx,
         sum(nl) AS sy,
         sum(pc * pc) AS sxx,
         sum(nl * nl) AS syy,
         sum(pc * nl) AS sxy
  FROM ol
)
SELECT n,
       CAST(CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS DOUBLE) AS corr_price_lines
FROM s
""",
)
def orders_price_lines_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between an order's total price and its line
    count, via EXACT integer moment sums (cents × counts): the running
    double accumulators inside built-in corr() drift with partial-agg
    order; here every moment (Σx, Σy, Σx², Σy², Σxy) is a BIGINT, and
    the final formula is one fixed chain of double ops — bit-identical
    on any engine or partitioning.

    Scale: lineitem pre-aggregates per orderkey (LEFT join keeps
    zero-line orders at x=price, y=0), then a single 1-row moment
    aggregate. Cent×count products stay ≪ 2⁶³ up to ~10¹² rows.
    """
    t = _t(spark, sf_dir, "orders", "lineitem")
    ol = (
        t["orders"]
        .join(
            t["lineitem"].select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left",
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_orderkey").alias("nl"))
        .select(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("pc"),
            "nl",
        )
    )
    # Moment sums accumulate in DECIMAL: Σpc² ≈ 4e19 overflows BIGINT at
    # sf0.01 already (DuckDB silently widens to HUGEINT; Spark must widen
    # explicitly). DECIMAL stays exact, so both engines reduce the same
    # integers to the same nearest-double at the end.
    dec = "decimal(27,0)"
    s = ol.agg(
        F.count("*").alias("n"),
        F.sum(F.col("pc").cast(dec)).alias("sx"),
        F.sum(F.col("nl").cast(dec)).alias("sy"),
        F.sum(F.col("pc").cast(dec) * F.col("pc")).alias("sxx"),
        F.sum(F.col("nl").cast(dec) * F.col("nl")).alias("syy"),
        F.sum(F.col("pc").cast(dec) * F.col("nl")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return s.select(
        "n",
        (num / (denx * deny)).cast("double").alias("corr_price_lines"),
    )


@register(
    "orders_median_price_by_priority",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), 0.5)
            / 100.0 AS DOUBLE) AS median_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median order value — the grouped form of the
    percentile surface (events_value_percentiles is global).

    Cross-engine exactness at p=0.5: the input is integer CENTS, and the
    even-n interpolation midpoint (a+b)/2 of two ≤2⁵³ integers is exact
    in double regardless of which interpolation formula the engine uses —
    higher quantiles of doubles would diverge in the last bit between
    a+(b−a)·f and (1−f)·a+f·b evaluation orders.

    Scale: Spark's exact percentile aggregates a per-partition value
    buffer and merges; for low-cardinality groups over huge rows switch
    to approx_percentile — the query text keeps the same shape.
    """
    t = _t(spark, sf_dir, "orders")
    pc = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
    return (
        t["orders"]
        .select("o_orderpriority", pc.alias("pc"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.percentile(F.col("pc"), F.lit(0.5)) / F.lit(100.0))
            .cast("double")
            .alias("median_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_props_variant",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT)                                AS n_events,
       min(CAST(props->>'$.k' AS BIGINT))                      AS vmin_k,
       max(CAST(props->>'$.k' AS BIGINT))                      AS vmax_k,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT)      AS vsum_k,
       CAST(count(*) FILTER (WHERE CAST(props->>'$.k' AS BIGINT) IS NULL)
            AS BIGINT)                                         AS vn_missing
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via Spark 4's VARIANT type — the
    schema-LESS twin of events_props_extract: ``parse_json`` ingests the
    whole document into a binary variant (no declared schema, unknown keys
    preserved), ``try_variant_get`` does typed path access at query time.
    Same aggregate, same oracle — certifying that the variant path and the
    schema-on-read path agree.

    At scale variant beats re-parsing JSON strings per query: the binary
    encoding is parsed once at ingest (or shredded into parquet), and path
    access is a field lookup, not a string scan. try_variant_get (not
    variant_get) so a missing key degrades to NULL like from_json does.
    """
    t = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("vmin_k"),
            F.max("k").alias("vmax_k"),
            F.sum("k").alias("vsum_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("vn_missing"),
        )
        .orderBy("event_type")
    )


@register(
    "events_daily_users_sketch_merge",
    oracle=f"""
WITH dh AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT AS h
  FROM events
),
daily AS (
  SELECT day, h FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
    FROM dh
  ) WHERE rn <= {SK.KMV_K}
),
msk AS (SELECT DISTINCT h FROM daily ORDER BY h LIMIT {SK.KMV_K}),
mest AS (SELECT count(*) AS nh, max(h) AS hk FROM msk),
dsk AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT AS h
  FROM events ORDER BY h LIMIT {SK.KMV_K}
),
dest AS (SELECT count(*) AS nh, max(h) AS hk FROM dsk),
days AS (SELECT CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_components
         FROM events)
SELECT (SELECT CAST(floor({_KMV_EST_SQL}) AS BIGINT) FROM mest) AS merged_estimate,
       (SELECT CAST(floor({_KMV_EST_SQL}) AS BIGINT) FROM dest) AS direct_estimate,
       days.n_components
FROM days
""",
)
def events_daily_users_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch certification — the property that makes sketches
    the 100 TB answer to COUNT(DISTINCT): per-day KMV bottom-k user
    sketches (operators/sketches.kmv_*) are built independently (one pass,
    <= k hashes of state per day), merged by union + re-bottom-k, and the
    merged estimate is compared with a direct whole-relation sketch. The
    bottom-k of a union IS the bottom-k of the unioned bottom-k sets
    (min-wise), so merged == direct EXACTLY — and because the estimator is
    a libm-free double chain over md5-half hashes, the whole construction
    (daily sketches, merge, both estimates) is rebuilt cell-for-cell by
    the DuckDB oracle (upgraded from rows-only round 6; Datasketches
    HLL union — register-wise max, same exact-merge property — stays
    pinned in tests/test_sketches.py, its binary is engine-specific).
    This is the matview/rollup story for distincts: store day sketches,
    answer any date-range distinct query by merging, never rescan."""
    events = _t(spark, sf_dir, "events")["events"]
    daily = SK.kmv_build_grouped(
        events.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    merged = SK.kmv_merge([daily.select("h")])
    mest = merged.agg(F.count("*").alias("nh"), F.max("h").alias("hk")).select(
        F.floor(SK.kmv_estimate_col(F.col("nh"), F.col("hk")))
        .cast("bigint")
        .alias("merged_estimate")
    )
    dest = (
        SK.kmv_build(events, "user_id")
        .agg(F.count("*").alias("nh"), F.max("h").alias("hk"))
        .select(
            F.floor(SK.kmv_estimate_col(F.col("nh"), F.col("hk")))
            .cast("bigint")
            .alias("direct_estimate")
        )
    )
    days = events.agg(
        F.count_distinct(F.date_trunc("day", F.col("ts"))).alias("n_components")
    )
    return mest.crossJoin(dest).crossJoin(days)  # three 1-row frames


@register(
    "events_segment_overlap_sketch",
    oracle="""
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'click' AND value >= 150),
b AS (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value >= 150)
SELECT (SELECT count(*) FROM a) AS seg_a_users,
       (SELECT count(*) FROM b) AS seg_b_users,
       (SELECT count(*) FROM a JOIN b USING(user_id)) AS both_users,
       (SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b))
         AS either_users,
       (SELECT count(*) FROM a ANTI JOIN b USING(user_id)) AS only_a_users
""",
)
def events_segment_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via Datasketches THETA set algebra: distinct users
    per behavioral segment as theta sketches, then intersection / union /
    difference ESTIMATED from the sketches — the only set-operation
    strategy that scales (exact overlap needs a distinct-user shuffle per
    segment pair; sketches are built once per segment and composed in
    driver-side microseconds for any boolean combination).

    Certified with a full oracle, not rows-only: below the sketch's
    nominal entries (default 2^12 = 4096) theta runs in exact mode —
    every hash is retained, so estimates ARE the exact counts; the
    certified regime covers both gate (150 users) and sweep (1.5k) scales.
    Past ~4k distinct the same plan degrades gracefully to ~2% relative
    error (documented, and the 5%-bounded HLL test pattern applies).
    """
    events = _t(spark, sf_dir, "events")["events"]

    def seg(etype: str):
        return events.filter(
            (F.col("event_type") == etype) & (F.col("value") >= 150)
        ).agg(F.theta_sketch_agg("user_id").alias(f"sk_{etype}"))

    return (
        seg("click")
        .crossJoin(seg("purchase"))  # two 1-row sketch frames
        .select(
            F.theta_sketch_estimate("sk_click").cast("long").alias("seg_a_users"),
            F.theta_sketch_estimate("sk_purchase").cast("long").alias("seg_b_users"),
            F.theta_sketch_estimate(
                F.theta_intersection("sk_click", "sk_purchase")
            ).cast("long").alias("both_users"),
            F.theta_sketch_estimate(F.theta_union("sk_click", "sk_purchase"))
            .cast("long")
            .alias("either_users"),
            F.theta_sketch_estimate(
                F.theta_difference("sk_click", "sk_purchase")
            ).cast("long").alias("only_a_users"),
        )
    )


@register(
    "events_value_quantiles_kll",
    oracle=f"""
WITH n AS (SELECT CAST(count(value) AS BIGINT) AS n FROM events),
t AS (
  SELECT n,
         CASE WHEN ((n + {SK.HSQ_K - 1}) // {SK.HSQ_K}) <= 1 THEN 0
              ELSE length(format('{{:b}}', ((n + {SK.HSQ_K - 1}) // {SK.HSQ_K}) - 1))
         END AS t
  FROM n
),
kept AS (
  SELECT value AS v
  FROM events, t
  WHERE value IS NOT NULL
    AND (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 14))::BIGINT
         % (CAST(1 AS BIGINT) << t)) = 0
),
byv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM kept GROUP BY v),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cw,
         (SELECT CAST(count(*) AS BIGINT) FROM kept) AS m
  FROM byv
)
SELECT
  (SELECT min(v) FROM cum WHERE cw >= (1 * m + 1) // 2) AS p50,
  (SELECT min(v) FROM cum WHERE cw >= (19 * m + 19) // 20) AS p95,
  (SELECT min(v) FROM cum WHERE cw >= (99 * m + 99) // 100) AS p99,
  (SELECT n FROM n) AS n_values
""",
)
def events_value_quantiles_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles via the KLL-class hash-sampled rank sketch
    (operators/sketches.py HSQ block): per-day value sketches at each
    day's local level threshold, merged by union + global re-threshold,
    p50/p95/p99 read from the merged sketch — the percentile matview
    pattern (store O(HSQ_K) rows + one exact count per day, answer any
    date range's percentiles by merging; the exact path is
    events_intraday_value_bands' histogram crossing).

    Upgraded from rows-only (round-6 verdict ask #3) with the same device
    that oracled the CMS and KMV queries: the random compactor of
    Datasketches KLL — whose state is irreproducible in SQL by design —
    is replaced by content-hash level sampling, making the sketch
    deterministic, exactly layout-insensitive, and rebuilt cell-for-cell
    by the DuckDB oracle (which builds the DIRECT whole-relation sketch;
    merged == direct exactly by the re-threshold argument in the HSQ
    docstring, and tests/test_sketches.py pins that equality). The
    built-in Datasketches KLL surface stays pinned in
    tests/test_pipeline_ops.py with its rank-error contract. Rank targets
    are integer ceilings (num*m + den-1) div den — no float rank
    boundary for engines to disagree on; p-values are raw parquet doubles
    both sides."""
    events = _t(spark, sf_dir, "events")["events"]
    sketch, counts = SK.hsq_build_grouped(
        events.withColumn("day", F.to_date("ts")), ["day"], "value", "event_id"
    )
    return SK.hsq_merge_quantiles(
        sketch.drop("day"),
        counts,
        {"p50": (1, 2), "p95": (19, 20), "p99": (99, 100)},
    )


@register(
    "events_value_skew_kurtosis",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT) AS vc
  FROM events
),
s AS (
  -- first factor HUGEINT: cent^4 tops BIGINT from ~55k cents (9.2e18)
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(vc)                                         AS s1,
         sum(CAST(vc AS HUGEINT) * vc)                   AS s2,
         sum(CAST(vc AS HUGEINT) * vc * vc)              AS s3,
         sum(CAST(vc AS HUGEINT) * vc * vc * vc)         AS s4
  FROM c GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mean,
         CAST(s2 AS DOUBLE) / n AS ex2,
         CAST(s3 AS DOUBLE) / n AS ex3,
         CAST(s4 AS DOUBLE) / n AS ex4
  FROM s
),
mm AS (
  SELECT event_type, n, mean,
         ex2 - mean * mean AS m2,
         ex3 - 3 * mean * ex2 + 2 * mean * mean * mean AS m3,
         ex4 - 4 * mean * ex3 + 6 * mean * mean * ex2
             - 3 * mean * mean * mean * mean AS m4
  FROM m
)
SELECT event_type, n,
       round(mean / 100, 4)                 AS mean_value,
       round(sqrt(m2) / 100, 4)             AS std_value,
       round(m3 / (m2 * sqrt(m2)), 6)       AS skewness,
       round(m4 / (m2 * m2) - 3, 6)         AS kurtosis_excess
FROM mm
ORDER BY event_type
""",
)
def events_value_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of event values per type via
    EXACT integer moment sums — the same engine-portable recipe as
    orders_price_lines_correlation extended to 3rd/4th moments: values to
    integer cents with one double multiply+floor (identical op both
    engines), raw sums Σv..Σv⁴ in DECIMAL(38,0) (DuckDB: HUGEINT), then
    one fixed left-associative chain of double ops. Built-in skewness() /
    kurtosis() run order-dependent float accumulators and also disagree
    between engines on sample-vs-population convention — this does neither.

    Scale: one map-side-combined groupBy to 5 rows; cent⁴ products are
    ≤1e20 per row, so DECIMAL(38,0) partials hold past 1e17 rows.
    """
    events = _t(spark, sf_dir, "events")["events"]
    vc = F.floor(F.col("value").cast("double") * 100).cast("long")
    # Products run in DECIMAL from the FIRST factor: cent^4 exceeds BIGINT
    # from ~55k cents (9.2e18) — a LONG multiply chain overflows (ANSI
    # throws; legacy wraps silently while DuckDB widens to HUGEINT, the
    # exact cross-engine divergence ADVICE r2 flagged in the z-score gate).
    # DECIMAL(18,0) factors: the 4-way product's declared precision caps at
    # 38; actual values fit DECIMAL(38,0) for cents up to ~3e9 (values to
    # ~$30M) — the per-VALUE domain is the binding constraint here, not row
    # count. A narrower factor type would itself overflow on large single
    # values (ANSI throw / silent NULL divergence).
    vcd = F.col("vc").cast("decimal(18,0)")
    s = (
        events.select("event_type", vc.alias("vc"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("vc").cast("decimal(18,0)")).alias("s1"),
            F.sum(vcd * vcd).alias("s2"),
            F.sum(vcd * vcd * vcd).alias("s3"),
            F.sum(vcd * vcd * vcd * vcd).alias("s4"),
        )
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mean"),
        (F.col("s2").cast("double") / F.col("n")).alias("ex2"),
        (F.col("s3").cast("double") / F.col("n")).alias("ex3"),
        (F.col("s4").cast("double") / F.col("n")).alias("ex4"),
    )
    mean = F.col("mean")
    mm = m.select(
        "event_type",
        "n",
        "mean",
        (F.col("ex2") - mean * mean).alias("m2"),
        (F.col("ex3") - F.lit(3) * mean * F.col("ex2") + F.lit(2) * mean * mean * mean).alias("m3"),
        (
            F.col("ex4")
            - F.lit(4) * mean * F.col("ex3")
            + F.lit(6) * mean * mean * F.col("ex2")
            - F.lit(3) * mean * mean * mean * mean
        ).alias("m4"),
    )
    m2 = F.col("m2")
    return mm.select(
        "event_type",
        "n",
        F.round(F.col("mean") / 100, 4).alias("mean_value"),
        F.round(F.sqrt(m2) / 100, 4).alias("std_value"),
        F.round(F.col("m3") / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(F.col("m4") / (m2 * m2) - 3, 6).alias("kurtosis_excess"),
    ).orderBy("event_type")


@register(
    "events_value_mad_outliers",
    oracle="""
WITH v AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT) AS vc
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(vc, 0.5) AS med FROM v GROUP BY event_type
),
dev AS (
  SELECT v.event_type, v.vc, abs(v.vc - med.med) AS adev, med.med
  FROM v JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(max(d.med) AS DOUBLE) / 100, 4) AS median_value,
       round(CAST(max(m.mad) AS DOUBLE) / 100, 4) AS mad_value,
       CAST(count(*) FILTER (WHERE d.adev > 3 * 1.4826 * m.mad) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
""",
)
def events_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen via median absolute deviation — the
    z-score gate's (events_value_outliers) heavy-tail-safe sibling: flag
    values beyond 3 × 1.4826 × MAD of the per-type median.

    Cross-engine exactness: values are integer cents, so the p=0.5
    interpolation midpoint is exact (the orders_median trick); absolute
    deviations are then half-integers and THEIR median is a quarter-integer
    — still exact in double. The 3×1.4826 scale factor multiplies
    identically-computed doubles on both engines, so even boundary rows
    classify identically.

    Scale: three column-pruned scans of (type, value) with 5-row broadcast
    joins between them — at 100 TB, re-scanning a 2-column projection
    beats materializing O(rows) state; each pass is a map + tiny agg.
    """
    events = _t(spark, sf_dir, "events")["events"]
    v = events.select(
        "event_type",
        F.floor(F.col("value").cast("double") * 100).cast("bigint").alias("vc"),
    )
    med = v.groupBy("event_type").agg(F.percentile("vc", F.lit(0.5)).alias("med"))
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("vc") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.max("med").cast("double") / 100, 4).alias("median_value"),
            F.round(F.max("mad").cast("double") / 100, 4).alias("mad_value"),
            F.count_if(F.col("adev") > F.lit(3) * F.lit(1.4826) * F.col("mad"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_part_affinity",
    oracle="""
WITH pair_orders AS (
  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2, a.l_orderkey
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
pair_n AS (
  SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_pair
  FROM pair_orders GROUP BY p1, p2
),
part_n AS (
  SELECT l_partkey AS p, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey
),
tot AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS t FROM lineitem
)
SELECT pn.p1, pn.p2, pn.n_pair,
       round(CAST(pn.n_pair AS DOUBLE) * tot.t / (CAST(pa.n AS DOUBLE) * pb.n), 4) AS lift
FROM pair_n pn
JOIN part_n pa ON pa.p = pn.p1
JOIN part_n pb ON pb.p = pn.p2
CROSS JOIN tot
ORDER BY pn.n_pair DESC, pn.p1, pn.p2
LIMIT 20
""",
)
def orders_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the top part pairs bought in the same order,
    with lift = P(pair) / (P(a)·P(b)) — support counts exact, lift one
    double division.

    Scale: the pair explosion is a per-order self-join, bounded by
    lines-per-order (≤7 in TPC-H shape), so it generates O(rows × lines)
    pair rows — NOT an all-parts cartesian; per-part order counts and the
    pair rollup are ordinary partial-agg shuffles on compact keys. The
    result is TakeOrdered(20).
    """
    t = _t(spark, sf_dir, "lineitem")
    li = t["lineitem"].select("l_orderkey", "l_partkey")
    # r12 restructure (guide §2.3/§2.4 — the q21 pre-reduction trick):
    # reduce to DISTINCT (order, part) ONCE before pairing. The pair
    # self-join of distinct sides emits already-distinct (p1, p2, order)
    # tuples — each (order, part) appears once per side — so the pre-r12
    # post-explosion DISTINCT (an exchange carrying every pair row, ~2M at
    # sf0.1, the plan's biggest shuffle) is gone, and the pair rollup's
    # map-side partial agg absorbs the explosion before its exchange.
    # part_n and tot read the same pre-reduced relation (per-part distinct
    # order count ≡ row count after the reduce), so all four consumers
    # hang off ONE canonical (order, part) exchange via ReuseExchange:
    # lineitem is scanned once, not three times.
    lid = li.distinct()
    a = lid.alias("a")
    b = lid.alias("b")
    pair_orders = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("p1"),
        F.col("b.l_partkey").alias("p2"),
    )
    pair_n = pair_orders.groupBy("p1", "p2").agg(
        F.count("*").cast("bigint").alias("n_pair")
    )
    part_n = lid.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = lid.agg(F.countDistinct("l_orderkey").cast("bigint").alias("t"))
    pa = part_n.alias("pa")
    pb = part_n.alias("pb")
    return (
        pair_n.join(pa, F.col("p1") == F.col("pa.p"))
        .join(pb, F.col("p2") == F.col("pb.p"))
        .crossJoin(F.broadcast(tot))
        .select(
            "p1",
            "p2",
            "n_pair",
            # doubles from the FIRST factor: n_pair*t and na*nb overflow a
            # LONG at full scale (support counts reach 1e9-scale); the
            # double chain is identical both engines, so still hash-stable
            F.round(
                F.col("n_pair").cast("double")
                * F.col("t")
                / (F.col("pa.n").cast("double") * F.col("pb.n")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.col("n_pair").desc(), "p1", "p2")
        .limit(20)
    )


@register(
    "events_signup_to_purchase_latency",
    oracle="""
WITH signups AS (
  SELECT user_id, min(epoch_ms(ts)) AS signup_ms
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
first_purchase AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS purchase_ms
  FROM events e JOIN signups s
    ON e.user_id = s.user_id
   AND e.event_type = 'purchase'
   AND epoch_ms(e.ts) >= s.signup_ms
  GROUP BY e.user_id
),
lat AS (
  SELECT s.user_id,
         s.signup_ms // 604800000 AS cohort_week,
         fp.purchase_ms - s.signup_ms AS latency_ms
  FROM signups s JOIN first_purchase fp USING (user_id)
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(quantile_cont(latency_ms, 0.5) AS DOUBLE) / 60000, 4) AS median_minutes
FROM lat
GROUP BY cohort_week
ORDER BY cohort_week
""",
)
def events_signup_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion: per signup-week cohort, the exact median minutes
    from a user's first signup to their first subsequent purchase.
    Latencies are integer milliseconds, so the p=0.5 midpoint is exact in
    double (the house exact-median trick); week bucketing is integer
    epoch arithmetic.

    Scale: two user-keyed aggregates and one user-keyed join — all on the
    behavior family's one shuffle key; the median aggregates per cohort
    over at most #users values.
    """
    events = _t(spark, sf_dir, "events")["events"]
    ms = F.unix_millis("ts")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ms).alias("signup_ms"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", ms.alias("pms")
    )
    first_purchase = (
        purchases.join(signups, "user_id")
        .filter(F.col("pms") >= F.col("signup_ms"))
        .groupBy("user_id")
        .agg(F.min("pms").alias("purchase_ms"))
    )
    lat = signups.join(first_purchase, "user_id").select(
        F.expr("signup_ms div 604800000").alias("cohort_week"),
        (F.col("purchase_ms") - F.col("signup_ms")).alias("latency_ms"),
    )
    return (
        lat.groupBy(F.col("cohort_week").cast("bigint").alias("cohort_week"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(
                F.percentile("latency_ms", F.lit(0.5)).cast("double") / 60000, 4
            ).alias("median_minutes"),
        )
        .orderBy("cohort_week")
    )


@register(
    "orders_pareto_8020",
    oracle="""
WITH cr AS (
  SELECT o_custkey,
         sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev
  FROM orders GROUP BY o_custkey
),
o AS (
  SELECT o_custkey, rev,
         coalesce(sum(rev) OVER (ORDER BY rev DESC, o_custkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cum_ex
  FROM cr
),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS total FROM cr)
SELECT t.n AS n_customers,
       CAST(count(*) FILTER (WHERE cum_ex * 5 < total * 4) AS BIGINT) AS top_customers,
       round(CAST(count(*) FILTER (WHERE cum_ex * 5 < total * 4) AS DOUBLE) / t.n, 6)
         AS pct_customers,
       round(CAST(sum(rev) FILTER (WHERE cum_ex * 5 < total * 4) AS DOUBLE)
             / CAST(total AS DOUBLE), 6) AS top_share
FROM o, t
GROUP BY t.n, t.total
""",
)
def orders_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the smallest customer prefix (by revenue,
    descending) whose cumulative share reaches 80% — how top-heavy the
    revenue base is.

    Scale design: the cumulative share needs a GLOBAL prefix sum over
    customers sorted by revenue — the naive single-partition window is the
    classic cliff at 1e9 customers. This reuses the packing family's exact
    distributed prefix sum (range exchange + O(P) partition offsets, see
    operators/packing.with_stream_offsets), so the only driver-side state
    is one number per partition. The 80% test is exact integer
    cross-multiplication (cum*5 < total*4) in DECIMAL — no ratio rounding
    on the boundary.
    """
    from kafka_clickhouse_example_spark.operators.packing import with_stream_offsets

    t = _t(spark, sf_dir, "orders")
    cr = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
            .cast("long")
            .alias("rev")
        )
        .withColumn("neg_rev", -F.col("rev"))
    )
    off = with_stream_offsets(cr, "rev", ["neg_rev", "o_custkey"], "cum_ex")
    totals = off.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("rev").cast("decimal(27,0)").alias("total"),
    )
    dec = "decimal(27,0)"
    in_top = F.col("cum_ex").cast(dec) * 5 < F.col("total") * 4
    return (
        off.crossJoin(F.broadcast(totals))
        .groupBy("n_customers", "total")
        .agg(
            F.count_if(in_top).cast("bigint").alias("top_customers"),
            F.round(
                F.count_if(in_top).cast("double") / F.col("n_customers"), 6
            ).alias("pct_customers"),
            F.round(
                F.sum(F.when(in_top, F.col("rev"))).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("top_share"),
        )
        .select("n_customers", "top_customers", "pct_customers", "top_share")
    )


@register(
    "orders_revenue_gini",
    oracle="""
WITH cr AS (
  SELECT o_custkey,
         sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i FROM cr
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(rev) AS total,
         sum(CAST(i AS HUGEINT) * rev) AS weighted
  FROM ranked
)
SELECT n,
       round(CAST(total AS DOUBLE) / 100, 2) AS total_revenue,
       round(2 * CAST(weighted AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1) / n, 6) AS gini
FROM s
""",
)
def orders_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality-index companion to orders_pareto_8020, via the
    rank-weighted formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over
    ascending-sorted revenues.

    Scale design: the global rank comes from the ranking module's
    distributed exact row number (range exchange + O(P) partition
    offsets — no single-partition window); Σ(i·x_i) accumulates in
    DECIMAL (HUGEINT in the oracle: rank × cents reaches ~1e25 at 1e9
    customers), and the final index is one fixed double chain.
    """
    from kafka_clickhouse_example_spark.operators.ranking import with_global_rank

    t = _t(spark, sf_dir, "orders")
    cr = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
            .cast("long")
            .alias("rev")
        )
    )
    ranked = with_global_rank(cr, ["rev", "o_custkey"], rank_col="i")
    s = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("rev").cast("decimal(27,0)")).alias("total"),
        F.sum((F.col("i").cast("decimal(27,0)") * F.col("rev"))).alias("weighted"),
    )
    n = F.col("n").cast("double")
    return s.select(
        "n",
        F.round(F.col("total").cast("double") / 100, 2).alias("total_revenue"),
        F.round(
            2 * F.col("weighted").cast("double") / (n * F.col("total").cast("double"))
            - (n + 1) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "orders_open_backlog_aging",
    oracle="""
WITH bounds AS (SELECT max(o_orderdate) AS asof FROM orders),
aged AS (
  SELECT CASE WHEN datediff('day', o_orderdate, bounds.asof) < 30 THEN '0-29d'
              WHEN datediff('day', o_orderdate, bounds.asof) < 90 THEN '30-89d'
              WHEN datediff('day', o_orderdate, bounds.asof) < 365 THEN '90-364d'
              ELSE '365d+' END AS age_bucket,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
  FROM orders, bounds WHERE o_orderstatus = 'O'
)
SELECT age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(pc) AS DOUBLE) / 100, 2) AS open_value
FROM aged GROUP BY age_bucket
ORDER BY CASE age_bucket WHEN '0-29d' THEN 0 WHEN '30-89d' THEN 1
         WHEN '90-364d' THEN 2 ELSE 3 END
""",
)
def orders_open_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: orders still in status 'O' bucketed by
    age relative to the latest order date — the operations report behind
    'how stale is our open pipeline'. Day arithmetic uses datediff on DATE
    values (calendar-exact, identical both engines); money sums are exact
    integer cents descaled once.

    Scale: one scan with a pushed status filter, a 1-row broadcast asof
    bound, and a 4-row aggregate.
    """
    t = _t(spark, sf_dir, "orders")
    bounds = t["orders"].agg(F.max("o_orderdate").alias("asof"))
    age = F.datediff(F.col("asof"), F.col("o_orderdate"))
    bucket = (
        F.when(age < 30, "0-29d")
        .when(age < 90, "30-89d")
        .when(age < 365, "90-364d")
        .otherwise("365d+")
    )
    return (
        t["orders"]
        .filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
                .cast("double")
                / 100,
                2,
            ).alias("open_value"),
        )
        # chronological, not lexicographic: '365d+' must come last
        .orderBy(
            F.when(F.col("age_bucket") == "0-29d", 0)
            .when(F.col("age_bucket") == "30-89d", 1)
            .when(F.col("age_bucket") == "90-364d", 2)
            .otherwise(3)
        )
    )


@register(
    "parts_return_rate_by_brand",
    oracle="""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE l.l_returnflag = 'R') AS BIGINT) AS n_returned,
       round(CAST(count(*) FILTER (WHERE l.l_returnflag = 'R') AS DOUBLE)
             / count(*), 6) AS return_rate
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY return_rate DESC, p.p_brand
""",
)
def parts_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per part brand — the product-quality screen: which
    brands come back. Exact counts, one double division; the part
    dimension broadcasts against the fact scan (the q14/q19 join shape),
    so the only shuffle is the #brands-row aggregate.
    """
    t = _t(spark, sf_dir, "lineitem", "part")
    returned = F.count_if(F.col("l_returnflag") == "R")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            returned.cast("bigint").alias("n_returned"),
            F.round(returned.cast("double") / F.count("*"), 6).alias("return_rate"),
        )
        .orderBy(F.col("return_rate").desc(), "p_brand")
    )


@register(
    "supplier_revenue_hhi",
    oracle="""
WITH sr AS (
  SELECT l_suppkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_suppkey
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
         sum(rev) AS total,
         sum(CAST(rev AS HUGEINT) * rev) AS sum_sq
  FROM sr
)
SELECT n_suppliers,
       round(CAST(sum_sq AS DOUBLE)
             / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 8) AS hhi,
       round(CAST(1 AS DOUBLE) / n_suppliers, 8) AS hhi_floor
FROM s
""",
)
def supplier_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue — 'how
    dependent are we on few suppliers'. HHI = Σ share² computed WITHOUT
    per-share division: Σrev² / (Σrev)² over exact integer cents (first
    factor HUGEINT/DECIMAL — rev² tops int64 past ~$30B per supplier), so
    the index is exact until one final double division. hhi_floor = 1/n,
    the perfectly-even baseline to read it against.

    Scale: one partial-agg rollup per supplier, one 1-row reduction.
    """
    t = _t(spark, sf_dir, "lineitem")
    sr = t["lineitem"].groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long")
        .alias("rev")
    )
    revd = F.col("rev").cast("decimal(27,0)")
    s = sr.agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum(revd).alias("total"),
        F.sum(revd * F.col("rev")).alias("sum_sq"),
    )
    return s.select(
        "n_suppliers",
        F.round(
            F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double")),
            8,
        ).alias("hhi"),
        F.round(F.lit(1).cast("double") / F.col("n_suppliers"), 8).alias("hhi_floor"),
    )


@register(
    "shipping_delay_by_priority",
    oracle="""
WITH d AS (
  SELECT o.o_orderpriority,
         datediff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(quantile_cont(delay_days, 0.5) AS DOUBLE) AS median_delay_days,
       CAST(max(delay_days) AS BIGINT) AS max_delay_days
FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def shipping_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per order priority: exact integer-day medians
    (the midpoint-of-integers trick) over the orders⋈lineitem join — does
    URGENT actually ship faster. The join is the repo's canonical
    fact-fact shuffle (bucketed layout removes its exchange, see
    tests/test_bucketing.py); the aggregate reduces to 5 rows.
    """
    t = _t(spark, sf_dir, "orders", "lineitem")
    d = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay_days"),
        )
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.percentile("delay_days", F.lit(0.5))
            .cast("double")
            .alias("median_delay_days"),
            F.max("delay_days").cast("bigint").alias("max_delay_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "nation_revenue_yoy",
    oracle="""
WITH yearly AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, yr
),
g AS (
  SELECT nation, yr, rev_c,
         lag(rev_c) OVER (PARTITION BY nation ORDER BY yr) AS prev
  FROM yearly
)
SELECT nation, yr,
       round(CAST(rev_c AS DOUBLE) / 100, 2) AS revenue,
       round((CAST(rev_c AS DOUBLE) - prev) * 100 / prev, 4) AS yoy_pct
FROM g WHERE prev IS NOT NULL
ORDER BY nation, yr
""",
)
def nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the multi-year trend
    panel the single-period TPC-H shapes (q5/q7) don't cover. Revenue
    accumulates as exact integer cents; YoY is one double chain per row;
    the lag window runs on the (nation, year)-sized rollup.

    Scale: nation broadcasts; orders⋈customer is the canonical fact-fact
    sort-merge (customer is NOT broadcastable at scale); one rollup
    shuffle on a compact key, then window math over at most
    nations x years rows.
    """
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    # nation broadcasts (25 rows); customer does NOT — it is a fact-sized
    # table at scale (the module's broadcastable-dimension doctrine), so
    # orders⋈customer stays a sort-merge/AQE join like every other
    # customer join in this file
    yearly = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
            .cast("long")
            .alias("rev_c")
        )
    )
    w = Window.partitionBy("nation").orderBy("yr")
    g = yearly.withColumn("prev", F.lag("rev_c").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return g.select(
        "nation",
        "yr",
        F.round(F.col("rev_c").cast("double") / 100, 2).alias("revenue"),
        F.round(
            (F.col("rev_c").cast("double") - F.col("prev")) * 100 / F.col("prev"), 4
        ).alias("yoy_pct"),
    ).orderBy("nation", "yr")


# --- Poisson bootstrap confidence interval -----------------------------------

# The distributed bootstrap: instead of resampling n rows WITH replacement
# (impossible without a global index), give every row an independent
# Poisson(1) weight per replicate — for large n the replicate weight vector
# is indistinguishable from multinomial resampling, and the whole procedure
# is map-only. Per-replicate uniforms come from ONE md5 per row via the
# Kirsch-Mitzenmacher device the minhash family already certifies:
# u_rep = (h1 + rep*h2) mod P over the 56-bit md5 halves (64 md5s/row was
# measured 15.3 s at sf0.1; one md5 + integer ops per rep is ~6x faster with
# the same cross-engine exactness). Thresholds are floor(CDF_Poisson(1)(k)*P)
# precomputed as exact integers.
BOOT_B = 64  # replicates
_BOOT_P = 72057594037927931  # largest prime < 2^56 (dedup.HASH_PRIME)
_POIS_THRESH = [
    26508507426831580, 53017014853663160, 66271268567078952, 70689353138217552,
    71793874281002200, 72014778509559128, 72051595880985280, 72056855505474728,
    72057512958535912, 72057586008876040, 72057593313910056, 72057593978004056,
]
_Q30_B = 1 << 30


def _pois_case_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_THRESH)
    )
    return f"(CASE {arms} ELSE {len(_POIS_THRESH)} END)"


_BOOT_H = "md5(CAST(o_orderkey AS VARCHAR))"
_BOOT_H1 = f"('0x' || substr({_BOOT_H}, 1, 14))::BIGINT"
_BOOT_H2 = f"('0x' || substr({_BOOT_H}, 15, 14))::BIGINT"


@register(
    "orders_revenue_bootstrap_ci",
    oracle=f"""
WITH reps AS (
  SELECT {_BOOT_H1} AS h1, {_BOOT_H2} AS h2,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * {_Q30_B}) AS BIGINT) AS q30,
         unnest(range(0, {BOOT_B})) AS rep
  FROM orders
),
weighted AS (
  SELECT rep, q30,
         {_pois_case_sql(f"((h1 + rep * h2) % {_BOOT_P})")} AS w
  FROM reps
),
means AS (
  SELECT rep,
         CAST(sum(CAST(w AS DECIMAL(38,0)) * q30) AS DOUBLE)
           / CAST(sum(CAST(w AS BIGINT)) AS DOUBLE) / {_Q30_B} AS m
  FROM weighted GROUP BY rep HAVING sum(w) > 0
),
ranked AS (
  SELECT m, CAST(row_number() OVER (ORDER BY m, rep) AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS b
  FROM means
)
SELECT b AS n_replicates,
       round(min(CASE WHEN rk = greatest(CAST(floor(b * 0.025) AS BIGINT), 1) THEN m END), 4) AS ci_lo,
       round(min(CASE WHEN rk = (b + 1) // 2 THEN m END), 4) AS ci_med,
       round(min(CASE WHEN rk = least(CAST(ceil(b * 0.975) AS BIGINT), b) THEN m END), 4) AS ci_hi
FROM ranked GROUP BY b
""",
)
def orders_revenue_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean order revenue via the POISSON bootstrap —
    the distributed-resampling trick (each row draws an independent
    Poisson(1) weight per replicate instead of global with-replacement
    sampling, which would need a coordinated index). {BOOT_B} replicates;
    per-replicate uniforms from ONE 128-bit md5 per row via the
    Kirsch-Mitzenmacher (h1 + rep*h2) mod P family (the device the
    minhash oracles already certify), mapped through exact integer
    Poisson(1) inverse-CDF thresholds — bit-reproducible on any engine or
    partitioning; replicate means use DECIMAL-exact weighted Q30 sums.

    Scale: map-only explode x{BOOT_B} then ONE partial-combined groupBy
    on replicate ({BOOT_B} groups); the order statistics run over
    {BOOT_B} rows. No global sort of data, no driver-side resampling. At
    100 TB the explode factor is the knob: B=64 reads the table once and
    shuffles {BOOT_B} partial rows per task.
    """
    from kafka_clickhouse_example_spark.operators.dedup import md5_half
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

    # compute-table load: the x64 explode inherits scan partitioning, and a
    # single-file parquet would otherwise run the whole resample ~serially
    # (measured 11.3 s -> see PLANS.md; the work is per-row CPU, not IO)
    configure_runtime(spark)
    orders = load_compute_table(spark, sf_dir, "orders")
    q30 = F.floor(F.col("o_totalprice").cast("double") * _Q30_B).cast("bigint")
    okey = F.col("o_orderkey").cast("string")
    reps = orders.select(
        md5_half(okey, 0).alias("h1"),
        md5_half(okey, 1).alias("h2"),
        q30.alias("q30"),
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("rep"),
    )
    u = (F.col("h1") + F.col("rep") * F.col("h2")) % _BOOT_P
    w = F.lit(len(_POIS_THRESH))
    for k in range(len(_POIS_THRESH) - 1, -1, -1):
        w = F.when(u < _POIS_THRESH[k], F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("w", w)
        .groupBy("rep")
        .agg(
            F.sum(F.col("w").cast("decimal(38,0)") * F.col("q30")).alias("swq"),
            F.sum(F.col("w").cast("bigint")).alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "rep",
            (
                F.col("swq").cast("double") / F.col("sw").cast("double") / _Q30_B
            ).alias("m"),
        )
    )
    from pyspark.sql import Window

    ranked = means.select(
        "m",
        F.row_number().over(Window.orderBy("m", "rep")).cast("bigint").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("b"),
    )
    lo_rk = F.greatest(F.floor(F.col("b") * 0.025).cast("bigint"), F.lit(1))
    med_rk = ((F.col("b") + 1) / 2).cast("bigint")
    hi_rk = F.least(F.ceil(F.col("b") * 0.975).cast("bigint"), F.col("b"))
    return ranked.groupBy(F.col("b").alias("n_replicates")).agg(
        F.round(F.min(F.when(F.col("rk") == lo_rk, F.col("m"))), 4).alias("ci_lo"),
        F.round(F.min(F.when(F.col("rk") == med_rk, F.col("m"))), 4).alias("ci_med"),
        F.round(F.min(F.when(F.col("rk") == hi_rk, F.col("m"))), 4).alias("ci_hi"),
    )
