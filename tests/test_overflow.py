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


def test_skew_kurtosis_survives_large_values_both_ansi_modes(spark, tmp_path):
    """cent^4 for a $25M value is ~4e37 — far past int64 (a LONG chain
    would throw under ANSI and silently wrap otherwise). The DECIMAL-first
    multiply must produce identical results under both ANSI settings."""
    from kafka_clickhouse_example_spark.plans.queries_analytics import (
        events_value_skew_kurtosis,
    )

    ev = spark.createDataFrame(
        [
            (i, 1_700_000_000_000 + i, i % 7, "a", v, "{}")
            for i, v in enumerate([25_000_000.0, 24_000_000.0, 10.0, 20.0, 30.0])
        ],
        "event_id long, ms long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out_dir = str(tmp_path / "big_events")
    ev.write.parquet(out_dir + "/events.parquet")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    results = {}
    try:
        for mode in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            results[mode] = [
                tuple(r) for r in events_value_skew_kurtosis(spark, out_dir).collect()
            ]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert results["true"] == results["false"]
    (row,) = results["true"]
    assert row[1] == 5  # n: no row silently dropped to NULL products
    assert all(v is not None for v in row)
