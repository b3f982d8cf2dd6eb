"""Storage-format breadth: the normalized flows table round-trips through
ORC, JSON-lines, and CSV with content preserved, and the columnar formats
still push predicates down to the scan. (Avro's spark-avro connector jar is
not bundled in this distribution, so ORC is the second columnar format.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.sources.catalog import load_compute_table


@pytest.fixture(scope="module")
def events_small(spark, sf_dir):
    return load_compute_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def _roundtrip(spark, df, path, fmt, read_kwargs=None):
    df.write.format(fmt).save(path)
    r = spark.read.format(fmt)
    for k, v in (read_kwargs or {}).items():
        r = r.option(k, v)
    if fmt in ("json", "csv"):
        r = r.schema(df.schema)  # text formats don't persist types
    return r.load(path)


@pytest.mark.parametrize(
    "fmt,kwargs", [("orc", {}), ("json", {}), ("csv", {"header": "true"})]
)
def test_format_roundtrip_preserves_content(spark, events_small, tmp_path, fmt, kwargs):
    path = str(tmp_path / fmt)
    if fmt == "csv":
        events_small.write.option("header", "true").csv(path)
        back = spark.read.options(**kwargs).schema(events_small.schema).csv(path)
    else:
        back = _roundtrip(spark, events_small, path, fmt, kwargs)
    assert back.schema == events_small.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, events_small.collect())
    )


def test_orc_pushes_predicates(spark, events_small, tmp_path):
    path = str(tmp_path / "orc_pushdown")
    events_small.write.orc(path)
    plan = (
        spark.read.orc(path)
        .filter(F.col("event_id") == 42)
        .select("event_id", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "event_id" in plan.split("PushedFilters")[1][:80]
    assert "ReadSchema: struct<event_id:bigint,value:double>" in plan


def test_schema_evolution_merge_read(spark, tmp_path):
    """Lake schema evolution: a column added mid-stream must be readable
    across old and new files (mergeSchema), with NULLs backfilling the
    old files — and filters on the evolved column keep NULL-safe
    semantics."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").write.parquet(
        path, mode="append"
    )
    spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "id long, s string, score double"
    ).write.parquet(path, mode="append")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r.id: (r.s, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30.0), 4: ("d", 40.0)}
    assert merged.filter("score > 35").count() == 1
    assert merged.filter("score IS NULL").count() == 2
