"""Golden tests for the decode+normalize core, mirroring the reference edge
cases (FIXTURES.md §1: happy path, missing fields, malformed message, extra
unknown fields)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from kafka_clickhouse_example_spark.operators.normalize import flows_from_json
from kafka_clickhouse_example_spark.schemas import FLOWS_COLUMNS

FULL_FLOW = {
    "TimeFlowStartMs": 1704067200000.0,
    "TimeFlowEndMs": 1704067201500.0,
    "SrcAddr": "10.0.0.1",
    "DstAddr": "10.0.0.2",
    "SrcK8S_Name": "pod-a",
    "DstK8S_Name": "pod-b",
    "SrcK8S_Type": "Pod",
    "DstK8S_Type": "Service",
    "SrcK8S_Namespace": "ns-a",
    "DstK8S_Namespace": "ns-b",
    "Bytes": 1234.0,
    "Packets": 7.0,
}


def _run(spark, messages):
    raw = spark.createDataFrame([Row(value=m) for m in messages])
    return flows_from_json(raw).collect()


def test_happy_path(spark):
    [row] = _run(spark, [json.dumps(FULL_FLOW)])
    assert row.start == 1704067200000.0
    assert row["end"] == 1704067201500.0
    assert row.src_ip == "10.0.0.1"
    assert row.dst_kind == "Service"
    assert row.bytes == 1234 and isinstance(row.bytes, int)
    assert row.packets == 7
    assert list(row.asDict().keys()) == FLOWS_COLUMNS


def test_missing_fields_default_to_zero_values(spark):
    # Node-flow shape: no K8S identity at all (README.md:115-117), and a row
    # missing the counters (export_clickhouse.go:45-80 zero-value semantics).
    no_k8s = {k: v for k, v in FULL_FLOW.items() if not k.startswith(("Src", "Dst"))}
    no_counters = {k: v for k, v in FULL_FLOW.items() if k not in ("Bytes", "Packets")}
    rows = _run(spark, [json.dumps(no_k8s), json.dumps(no_counters)])
    by_bytes = sorted(rows, key=lambda r: r.bytes)
    assert by_bytes[0].bytes == 0 and by_bytes[0].packets == 0
    assert by_bytes[0].src_ip == "10.0.0.1" or by_bytes[0].src_ip == ""
    node_row = [r for r in rows if r.src_name == ""][0]
    assert node_row.src_namespace == "" and node_row.dst_kind == ""
    assert node_row.bytes == 1234  # non-missing fields untouched


def test_malformed_message_dropped(spark):
    rows = _run(spark, ["{not json", json.dumps(FULL_FLOW), ""])
    assert len(rows) == 1
    assert rows[0].src_ip == "10.0.0.1"


def test_extra_unknown_fields_ignored(spark):
    extra = dict(FULL_FLOW, SomethingNew=42, Nested={"a": 1})
    [row] = _run(spark, [json.dumps(extra)])
    assert row.bytes == 1234
    assert list(row.asDict().keys()) == FLOWS_COLUMNS


def test_float_narrowing_truncates(spark):
    msg = dict(FULL_FLOW, Bytes=99.9, Packets=3.7)
    [row] = _run(spark, [json.dumps(msg)])
    assert row.bytes == 99 and row.packets == 3


def test_wrong_typed_field_behavior(spark):
    """Where the reference PANICS the whole process on a wrong-typed value
    (unguarded type assertion, export_clickhouse.go:52), we degrade per
    record: a JSON string where a number is expected marks the record
    corrupt -> dropped (the log-and-skip path, same as malformed JSON),
    while a JSON number where a string is expected coerces to its text form
    and the record survives. Documented deviation -- crash-per-record is not
    an option for a 100 TB pipeline."""
    assert _run(spark, [json.dumps(dict(FULL_FLOW, Bytes="not-a-number"))]) == []
    [row] = _run(spark, [json.dumps(dict(FULL_FLOW, SrcAddr=12345))])
    assert row.src_ip == "12345" and row.bytes == 1234


def test_arrow_decode_equals_jvm_decode(spark):
    """decode_flows_arrow must match from_json PERMISSIVE semantics on every
    edge case: happy path, missing fields, malformed, wrong-typed, number
    coercion, extra fields."""
    from kafka_clickhouse_example_spark.operators.normalize import flows_from_json as ffj

    messages = [
        json.dumps(FULL_FLOW),
        json.dumps({"TimeFlowStartMs": 1.0, "SrcAddr": "10.9.9.9"}),  # missing keys
        "{not json",
        "",
        json.dumps(dict(FULL_FLOW, Bytes="not-a-number")),  # wrong type -> drop
        json.dumps(dict(FULL_FLOW, SrcAddr=12345)),  # number->string coercion
        json.dumps(dict(FULL_FLOW, SomethingNew=42)),  # extra field ignored
        "[1, 2, 3]",  # valid JSON, not an object
    ]
    df = spark.createDataFrame([(m,) for m in messages], "value string")
    jvm = {tuple(r) for r in ffj(df, use_arrow=False).collect()}
    arrow = {tuple(r) for r in ffj(df, use_arrow=True).collect()}
    assert arrow == jvm
    # full==extra-field (same 12 cols after projection) + partial + coerced
    assert len(jvm) == 3


def test_custom_jsonl_datasource_matches_text_source(spark, tmp_path):
    """The netobserv_jsonl Python DataSource yields the same value rows as
    spark.read.text, one partition per file, and feeds the standard decode
    path unchanged."""
    import json

    from kafka_clickhouse_example_spark.operators.normalize import flows_from_json
    from kafka_clickhouse_example_spark.sources.jsonl_source import (
        NetObservJsonlDataSource,
    )

    d = tmp_path / "in"
    d.mkdir()
    rows_a = [{"TimeFlowStartMs": 1.0, "TimeFlowEndMs": 2.0, "SrcAddr": "a",
               "DstAddr": "b", "Bytes": 10.0, "Packets": 1.0}]
    rows_b = [{"TimeFlowStartMs": 3.0, "TimeFlowEndMs": 4.0, "SrcAddr": "c",
               "DstAddr": "d", "Bytes": 20.0, "Packets": 2.0}]
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows_a) + "\n")
    (d / "b.json").write_text("\n".join(json.dumps(r) for r in rows_b) + "\n")
    (d / "ignored.txt").write_text("not picked up")

    spark.dataSource.register(NetObservJsonlDataSource)
    raw = spark.read.format("netobserv_jsonl").option("path", str(d)).load()
    assert raw.rdd.getNumPartitions() == 2  # one per matching file
    got_values = {r.value for r in raw.collect()}
    want_values = {r.value for r in spark.read.text(str(d / "a.jsonl")).collect()} | {
        r.value for r in spark.read.text(str(d / "b.json")).collect()
    }
    assert got_values == want_values
    assert {r.src_file for r in raw.collect()} == {"a.jsonl", "b.json"}

    # Same decode path as every other transport.
    flows = flows_from_json(raw.select("value"))
    got = {(r.src_ip, r.dst_ip, r.bytes) for r in flows.collect()}
    assert got == {("a", "b", 10), ("c", "d", 20)}


def test_custom_jsonl_datasource_edge_cases(spark, tmp_path):
    """Empty dir -> zero rows; missing path option -> loud error."""
    import pytest as _pytest

    from kafka_clickhouse_example_spark.sources.jsonl_source import (
        NetObservJsonlDataSource,
    )

    spark.dataSource.register(NetObservJsonlDataSource)
    empty = tmp_path / "empty"
    empty.mkdir()
    df = spark.read.format("netobserv_jsonl").option("path", str(empty)).load()
    assert df.count() == 0 and df.columns == ["value", "src_file"]

    with _pytest.raises(Exception, match="path"):
        spark.read.format("netobserv_jsonl").load().collect()
