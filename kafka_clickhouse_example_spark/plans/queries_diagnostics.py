"""Operational diagnostics: the reports an engineer runs BEFORE launching a
100 TB job — join-key skew profiling (does this key need salting / AQE skew
handling?), exact join-output cardinality prediction (will this join
explode?), and Count-Min frequency estimation quality.

Scale design: both reports aggregate to per-key frequencies first (one
shuffle on the key being profiled — the same shuffle the real join would
do, so the profile predicts the join's behavior), then reduce to a few
rows. Nothing here is proportional to input size on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import sketches as SK
from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_table


@register(
    "diag_join_key_skew",
    oracle="""
WITH li AS (
  SELECT 'lineitem.l_orderkey' AS domain, count(*) AS freq
  FROM lineitem GROUP BY l_orderkey
),
ev AS (
  SELECT 'events.user_id' AS domain, count(*) AS freq
  FROM events GROUP BY user_id
),
freqs AS (SELECT * FROM li UNION ALL SELECT * FROM ev),
stats AS (
  SELECT domain,
         CAST(sum(freq) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(freq) AS BIGINT) AS max_freq
  FROM freqs GROUP BY domain
),
hot AS (
  SELECT f.domain, CAST(count(*) AS BIGINT) AS hot_keys
  FROM freqs f JOIN stats s ON f.domain = s.domain
  WHERE f.freq * s.n_keys > 2 * s.n_rows
  GROUP BY f.domain
)
SELECT s.domain, s.n_rows, s.n_keys, s.max_freq,
       coalesce(h.hot_keys, 0) AS hot_keys,
       round(CAST(s.max_freq * s.n_keys AS DOUBLE) / s.n_rows, 4) AS skew_ratio
FROM stats s LEFT JOIN hot h ON s.domain = h.domain
ORDER BY s.domain
""",
)
def diag_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of the two highest-volume join/agg keys (lineitem's
    order key, events' user id): max/avg frequency ratio and the count of
    hot keys (> 2x average) — the inputs to a salting / AQE-skew decision.

    The per-key frequency shuffle is the same shuffle the profiled join
    would perform, so cost and skew seen here transfer directly. Stats
    reduce per domain; the hot-key test multiplies integers (freq * n_keys
    vs 2 * n_rows) instead of dividing, staying exact.
    """
    configure_runtime(spark)

    def profile(freq: DataFrame, domain: str) -> DataFrame:
        # both the stats and hot-key branches consume the same freq
        # aggregate: its Exchange subtree is canonically identical on both
        # paths, so ReuseExchange executes the table scan + frequency
        # shuffle ONCE and both branches read the shared shuffle output
        # (r11: the former eager-checkpoint version paid 2 extra jobs per
        # run for the same single-shuffle guarantee — constr 2.1 s -> ~0)
        stats = freq.agg(
            F.sum("freq").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.max("freq").cast("bigint").alias("max_freq"),
        ).withColumn("domain", F.lit(domain))
        hot = (
            freq.crossJoin(F.broadcast(stats))
            .filter(F.col("freq") * F.col("n_keys") > 2 * F.col("n_rows"))
            .agg(F.count("*").cast("bigint").alias("hot_keys"))
        )
        return stats.crossJoin(F.broadcast(hot)).select(
            "domain",
            "n_rows",
            "n_keys",
            "max_freq",
            F.coalesce("hot_keys", F.lit(0)).cast("bigint").alias("hot_keys"),
            F.round(
                (F.col("max_freq") * F.col("n_keys")).cast("double") / F.col("n_rows"), 4
            ).alias("skew_ratio"),
        )

    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    li_freq = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("freq"))
    ev_freq = events.groupBy("user_id").agg(F.count("*").alias("freq"))
    return (
        profile(li_freq, "lineitem.l_orderkey")
        .unionByName(profile(ev_freq, "events.user_id"))
        .orderBy("domain")
    )


def _cms_h_sql(which: int) -> str:
    # operators/dedup.md5_half over the key's string form — the exact
    # bytes Spark's md5(cast(cast(user_id as string) as binary)) hashes.
    return f"('0x' || substr(md5(CAST(user_id AS VARCHAR)), {1 + which * 14}, 14))::BIGINT"


_CMS_ORACLE = f"""
WITH rs AS (SELECT unnest(range(0, {SK.CMS_DEPTH})) AS r),
cells AS (
  SELECT rs.r AS r, (e.h1 + rs.r * e.h2) % {SK.CMS_WIDTH} AS idx,
         count(*) AS cnt
  FROM (SELECT {_cms_h_sql(0)} AS h1, {_cms_h_sql(1)} AS h2 FROM events) e
  CROSS JOIN rs GROUP BY 1, 2
),
probe_cells AS (
  SELECT p.user_id, rs.r AS r, (p.h1 + rs.r * p.h2) % {SK.CMS_WIDTH} AS idx
  FROM (SELECT DISTINCT user_id, {_cms_h_sql(0)} AS h1, {_cms_h_sql(1)} AS h2
        FROM events) p
  CROSS JOIN rs
),
est AS (
  SELECT pc.user_id, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_n
  FROM probe_cells pc LEFT JOIN cells c ON pc.r = c.r AND pc.idx = c.idx
  GROUP BY pc.user_id
),
tru AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_n FROM events GROUP BY user_id
)
SELECT e.user_id, t.true_n, e.est_n,
       CAST(e.est_n - t.true_n AS BIGINT) AS overestimate
FROM est e JOIN tru t USING (user_id)
ORDER BY e.user_id
"""


@register("events_user_counts_cms", oracle=_CMS_ORACLE)
def events_user_counts_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch accuracy report: estimate every user's event count
    from a 4x2048 sketch and compare to the exact count. est_n >= true_n
    always (CMS never undercounts); the overestimate column is the
    measurable collision error. Oracle-backed since round 5: the cell
    hashes are the Kirsch-Mitzenmacher (h1 + r*h2) mod width family over
    md5 halves (operators/dedup.md5_half), so DuckDB rebuilds the sketch
    cell-for-cell in SQL; one-sided error and exact mergeability are
    additionally pinned by tests/test_sketches.py.
    """
    configure_runtime(spark)
    events = load_table(spark, sf_dir, "events")
    sketch = SK.cms_build(events, "user_id")
    probes = events.select("user_id").distinct()
    est = SK.cms_probe(sketch, probes, "user_id")
    true = events.groupBy("user_id").agg(F.count("*").alias("true_n"))
    # est is O(users) and broadcast at test scale — AUDITED AND CLEARED
    # (round-10 valley audit): skinny 16 B rows whose estimate tracks the
    # events scan linearly (~small-constant under-read), so the broadcast
    # window closes far below the driver/broadcast caps. See SCALE.md
    # "valley criterion" — pin only where UDF/array widening makes the
    # under-read >= ~16x.
    return (
        est.join(true, "user_id")
        .select(
            "user_id",
            F.col("true_n").cast("bigint").alias("true_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
            (F.col("est_n") - F.col("true_n")).cast("bigint").alias("overestimate"),
        )
        .orderBy("user_id")
    )


@register(
    "diag_join_cardinality",
    oracle="""
WITH ol AS (
  SELECT 'orders x lineitem ON orderkey' AS join_name,
         (SELECT CAST(count(*) AS BIGINT) FROM orders)   AS left_rows,
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS right_rows,
         (SELECT coalesce(CAST(sum(a.n * b.n) AS BIGINT), 0) FROM
            (SELECT o_orderkey k, count(*) n FROM orders GROUP BY 1) a
            JOIN (SELECT l_orderkey k, count(*) n FROM lineitem GROUP BY 1) b
            USING (k)) AS predicted_rows
),
co AS (
  SELECT 'customer x orders ON custkey' AS join_name,
         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS left_rows,
         (SELECT CAST(count(*) AS BIGINT) FROM orders)   AS right_rows,
         (SELECT coalesce(CAST(sum(a.n * b.n) AS BIGINT), 0) FROM
            (SELECT c_custkey k, count(*) n FROM customer GROUP BY 1) a
            JOIN (SELECT o_custkey k, count(*) n FROM orders GROUP BY 1) b
            USING (k)) AS predicted_rows
)
SELECT * FROM ol UNION ALL SELECT * FROM co
ORDER BY join_name
""",
)
def diag_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT join-output cardinality prediction — Σ_k freq_left(k) ×
    freq_right(k) over the key histograms — without executing the join.
    What a planner's estimator approximates with sketches, computed
    exactly here as the pre-flight check for 'will this join explode'.

    Scale: two per-key frequency aggregates (compact histograms) joined on
    the key — the histograms are #distinct-keys rows, so the prediction
    costs two rollups plus a histogram join, not the join's own output.
    Each histogram feeds two consumers (the prediction join and the row
    count); both hang off the same canonical Exchange, so ReuseExchange
    runs each scan+shuffle once inside ONE job whose four independent
    histogram stages schedule concurrently (r11: the former materialize_all
    version paid 4 eager checkpoint jobs per run — constr 7.5 s -> ~0.2).
    """
    configure_runtime(spark)

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def hist(df: DataFrame, key: str, out: str) -> DataFrame:
        return df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias(out))

    o_hist = hist(orders, "o_orderkey", "na")
    l_hist = hist(lineitem, "l_orderkey", "nb")
    c_hist = hist(customer, "c_custkey", "na")
    oc_hist = hist(orders, "o_custkey", "nb")

    def predict(fa: DataFrame, fb: DataFrame, name: str) -> DataFrame:
        # row counts derive from the histograms (sum of freqs) instead of
        # a second count() scan — each histogram materialized once above
        pred = fa.join(fb, "k").agg(
            F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("predicted_rows")
        )
        counts = fa.agg(F.sum("na").cast("bigint").alias("left_rows")).crossJoin(
            fb.agg(F.sum("nb").cast("bigint").alias("right_rows"))
        )
        return (
            counts.crossJoin(F.broadcast(pred))
            .select(
                F.lit(name).alias("join_name"),
                "left_rows",
                "right_rows",
                F.coalesce("predicted_rows", F.lit(0)).alias("predicted_rows"),
            )
        )

    return (
        predict(o_hist, l_hist, "orders x lineitem ON orderkey")
        .unionByName(predict(c_hist, oc_hist, "customer x orders ON custkey"))
        .orderBy("join_name")
    )


@register(
    "diag_snapshot_diff",
    oracle="""
WITH new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         CASE WHEN o_orderkey % 97 = 0 THEN 'X-' || o_orderpriority
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 103 = 0
),
d AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_orderpriority = n.o_orderpriority THEN 'unchanged'
              ELSE 'changed' END AS diff_status
  FROM orders o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT diff_status, CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY diff_status ORDER BY diff_status
""",
)
def diag_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation report: classify every order key across two
    table versions (the second derived deterministically — priorities
    rewritten on %97 keys, %101 keys dropped, %103 keys re-added under new
    ids) as unchanged/changed/removed/added via operators/layout.diff_tables.

    The operator compares md5 row fingerprints (keys + 32-char hashes
    through the full-outer join, never two full payloads); the oracle
    reclassifies from raw column comparisons — a hash match certifies the
    fingerprint classification agrees with ground truth. This is the
    post-MERGE/backfill validation step: 'is the new snapshot the old one
    plus exactly the intended delta?'
    """
    from kafka_clickhouse_example_spark.operators.layout import diff_tables

    configure_runtime(spark)
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    modified = orders.filter(key % 101 != 0).withColumn(
        "o_orderpriority",
        F.when(key % 97 == 0, F.concat(F.lit("X-"), F.col("o_orderpriority"))).otherwise(
            F.col("o_orderpriority")
        ),
    )
    added = orders.filter(key % 103 == 0).withColumn(
        "o_orderkey", key + 10_000_000
    )
    new = modified.unionByName(added)
    diff = diff_tables(orders, new, ["o_orderkey"])
    return (
        diff.groupBy("diff_status")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("diff_status")
    )


@register(
    "diag_table_stats",
    oracle="""
SELECT 'events' AS tbl, 'user_id' AS col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(user_id) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events
UNION ALL
SELECT 'events', 'event_type', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(event_type) AS BIGINT),
       CAST(count(DISTINCT event_type) AS BIGINT)
FROM events
UNION ALL
SELECT 'orders', 'o_custkey', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'documents', 'lang', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(lang) AS BIGINT),
       CAST(count(DISTINCT lang) AS BIGINT)
FROM documents
UNION ALL
SELECT 'documents', 'source', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(source) AS BIGINT),
       CAST(count(DISTINCT source) AS BIGINT)
FROM documents
ORDER BY tbl, col
""",
)
def diag_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (row count, null count, exact
    distinct count) for the join/filter columns a cost-based optimizer
    feeds on — the catalog-statistics surface, computed in-engine.

    Scale: one aggregate per profiled table computes EVERY requested
    column's stats in a single pass (count + count(col) + count_distinct
    share the scan); the per-column long form is a driver-side reshape of
    a handful of scalars. Exact distinct on a 100 TB key column is itself
    a shuffle — swap count_distinct for approx_count_distinct at scale,
    same query shape.
    """
    configure_runtime(spark)

    def profile(tbl: str, cols: list[str]) -> DataFrame:
        df = load_table(spark, sf_dir, tbl)
        aggs = [F.count("*").cast("bigint").alias("_n")]
        for c in cols:
            aggs.append((F.count("*") - F.count(c)).cast("bigint").alias(f"_nulls_{c}"))
            aggs.append(F.count_distinct(c).cast("bigint").alias(f"_dist_{c}"))
        row = df.agg(*aggs)
        stack_args = []
        for c in cols:
            stack_args.append(f"'{c}', _nulls_{c}, _dist_{c}")
        return row.select(
            F.lit(tbl).alias("tbl"),
            F.col("_n").alias("n_rows"),
            F.expr(
                f"stack({len(cols)}, {', '.join(stack_args)}) AS (col, n_nulls, n_distinct)"
            ),
        ).select("tbl", "col", "n_rows", "n_nulls", "n_distinct")

    return (
        profile("events", ["user_id", "event_type"])
        .unionByName(profile("orders", ["o_custkey"]))
        .unionByName(profile("documents", ["lang", "source"]))
        .orderBy("tbl", "col")
    )
