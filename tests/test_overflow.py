"""Overflow-regression tests: integer moment math must not wrap where the
DuckDB oracle would widen to HUGEINT (ADVICE r2, events_value_outliers).

Group sizes here are chosen so the z-test comparison products (dev²,
n·S₂, S²) exceed 2⁶³ — Spark's non-ANSI long multiply would wrap silently
and diverge from exact arithmetic; the DECIMAL-widened products must not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.plans.queries_analytics import events_value_outliers


def test_value_outliers_products_exceed_int64(spark, tmp_path):
    # One group of 400k rows at 100.00 (xc=10⁴ cents) + one 200.00 outlier:
    # n·S₂ ≈ 1.6e19 and S² ≈ 1.6e19, both past the 9.2e18 int64 limit.
    n_base = 400_000
    ev = (
        spark.range(n_base + 1)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id")).alias("ts"),
            (F.col("id") % 97).alias("user_id"),
            F.lit("a").alias("event_type"),
            F.when(F.col("id") < n_base, F.lit(100.0)).otherwise(F.lit(200.0)).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    # Exact Python-bigint replica of the gate.
    xs = [10_000] * n_base + [20_000]
    n, s = len(xs), sum(xs)
    s2 = sum(x * x for x in xs)
    assert n * s2 > 2**63 and s * s > 2**63, "fixture must actually overflow int64"
    expected = {i for i, x in enumerate(xs) if (n * x - s) ** 2 > 4 * (n * s2 - s * s)}
    assert expected == {n_base}, "only the planted outlier should trip the 2σ gate"

    got = {r.event_id for r in events_value_outliers(spark, str(tmp_path)).collect()}
    assert got == expected
