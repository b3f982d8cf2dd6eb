"""Salted aggregation/join invariance: salting changes placement, never
results."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark):
    # Deliberately skewed: 90% of rows share key 1.
    rows = [(i, 1 if i % 10 else 2, float(i % 7)) for i in range(1000)]
    df = spark.createDataFrame(rows, "row_id long, k long, v double")
    plain = {
        (r["k"]): (str(r["total"]), r["n"])
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("total"), F.count("v").alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (str(r["total"]), r["n"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": ("v", lambda c: F.sum(F.col(c).cast("decimal(18,2)")), F.sum),
                "n": ("v", F.count, F.sum),
            },
            salt_col=F.col("row_id"),
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [(i, 1 if i % 5 else 2) for i in range(500)], "row_id long, k long"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k long, label string")
    plain = {tuple(r) for r in big.join(small, "k").select("row_id", "label").collect()}
    salted = {
        tuple(r)
        for r in salted_join(big, small, "k", salt_col=F.col("row_id"), n_salts=8)
        .select("row_id", "label")
        .collect()
    }
    assert salted == plain
    # inner join drops unmatched small-side keys either way
    assert all(lbl in ("hot", "cold") for _, lbl in salted)


def test_approx_cardinality_within_bound(spark, sf_dir):
    """HLL estimate within its configured 1% rsd (allow 5% slack) of exact."""
    from pyspark.sql import functions as F
    from kafka_clickhouse_example_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, n, approx[k])


def test_weighted_sample_without_replacement_contracts(spark):
    from kafka_clickhouse_example_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, 1000.0 if i == 7 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample_without_replacement(df, "w", "id", 10)
    ids = {r.id for r in got.collect()}
    assert len(ids) == 10  # exactly k, no replacement
    assert 7 in ids  # a 1000x weight is effectively always drawn
    # deterministic across partitionings
    ids2 = {
        r.id
        for r in weighted_sample_without_replacement(
            df.repartition(13), "w", "id", 10
        ).collect()
    }
    assert ids == ids2
    # inclusion rate tracks weight: double-weight stratum should win more
    rows2 = [(i, 2.0 if i < 500 else 1.0) for i in range(1000)]
    df2 = spark.createDataFrame(rows2, "id long, w double")
    picked = {r.id for r in weighted_sample_without_replacement(df2, "w", "id", 200).collect()}
    heavy = sum(1 for i in picked if i < 500)
    assert heavy > 100  # more than the uniform expectation


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from kafka_clickhouse_example_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 1.0), (4, 1.0), (5, 1.0)], "id long, w double"
    )
    got = {r.id for r in weighted_sample_without_replacement(df, "w", "id", 5).collect()}
    # zero weight must not crash (ANSI divide-by-zero) and negative weight
    # must not auto-win; both are excluded entirely
    assert got == {3, 4, 5}
