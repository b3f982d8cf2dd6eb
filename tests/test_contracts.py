"""Schema-contract drift detection and admission-gate semantics."""

from __future__ import annotations

import pytest

from kafka_clickhouse_example_spark.operators.contracts import (
    enforce_contract,
    schema_drift,
)

CONTRACT = "event_id bigint, user_id bigint, value double"


def test_satisfied_contract_reports_nothing(spark):
    df = spark.createDataFrame([(1, 2, 3.0)], CONTRACT)
    assert schema_drift(df, CONTRACT) == []
    out = enforce_contract(df, CONTRACT)
    assert out.columns == ["event_id", "user_id", "value"]


def test_drift_kinds(spark):
    df = spark.createDataFrame(
        [(1, "2", 5)], "event_id bigint, user_id string, extra_col int"
    )
    kinds = {(d["column"], d["kind"]) for d in schema_drift(df, CONTRACT)}
    assert kinds == {
        ("user_id", "type_changed"),
        ("value", "missing"),
        ("extra_col", "extra"),
    }


def test_enforce_gate_raises_on_breaking_drift(spark):
    df = spark.createDataFrame([(1, 2)], "event_id bigint, user_id bigint")
    with pytest.raises(ValueError, match="missing"):
        enforce_contract(df, CONTRACT)


def test_benign_extra_columns_are_projected_away(spark):
    df = spark.createDataFrame(
        [(1, 2, 3.0, "x")], "event_id bigint, user_id bigint, value double, junk string"
    )
    out = enforce_contract(df, CONTRACT)
    assert out.columns == ["event_id", "user_id", "value"]


def test_nullability_only_tightening_direction_flags(spark):
    strict = "k bigint not null"
    relaxed_df = spark.createDataFrame([(1,)], "k bigint")  # nullable
    drift = schema_drift(relaxed_df, strict)
    assert [d["kind"] for d in drift] == ["nullability_tightened"]
    # the reverse direction (contract nullable, data NOT NULL) is fine
    strict_df = spark.range(1).selectExpr("id as k")  # non-nullable
    assert schema_drift(strict_df, "k bigint") == []


def test_case_insensitive_and_nested_nullability_lenient(spark):
    # review fixes: Spark resolves names case-insensitively by default, and
    # a nested containsNull=false is a safer shape, not breaking drift
    df = spark.createDataFrame([(1,)], "Event_ID bigint")
    assert schema_drift(df, "event_id bigint") == []
    arr_df = spark.range(1).selectExpr("array(id) as xs")  # containsNull=false
    assert schema_drift(arr_df, "xs array<bigint>") == []


def test_case_collision_refused_not_silently_collapsed(spark):
    """ADVICE r3: columns differing only by case (legal under
    spark.sql.caseSensitive=true) must not fold into one dict key — that
    silently drops one side and lets real drift on it pass. The comparator
    refuses the ambiguous schema loudly instead."""
    import pytest

    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("K")
    )
    with pytest.raises(ValueError, match="colliding column names"):
        schema_drift(df, "k bigint")
    # contract-side collisions are refused the same way
    ok_df = spark.range(1).selectExpr("id as k")
    with pytest.raises(ValueError, match="colliding column names"):
        schema_drift(ok_df, "k bigint, K int")


def test_schema_drift_rejects_exact_duplicate_columns(spark):
    """Same-case duplicate names (legal via alias) must be refused too —
    the dict comparison would silently drop one and hide its drift."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators.contracts import schema_drift

    df = spark.range(1).select(
        F.lit(1).alias("a"), F.lit("x").alias("a")
    )
    with pytest.raises(ValueError, match="colliding column names"):
        schema_drift(df, "a INT")
