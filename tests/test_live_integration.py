"""Live-integration tests: REAL Kafka consume (S1) and REAL ClickHouse
JDBC round-trip (S3) — the two reference paths the sandbox can only verify
through stand-ins (no broker, no server, no JDBC jar in the container).

Skipped unless SPARK_GRAFT_LIVE=1. Bring up the services with
``docker compose -f contrib/docker-compose.live.yml up -d`` and export:

  SPARK_GRAFT_LIVE=1
  SPARK_GRAFT_KAFKA=localhost:9092
  SPARK_GRAFT_CLICKHOUSE_JDBC=jdbc:clickhouse://localhost:8123/default
  SPARK_GRAFT_SPARK_PACKAGES=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>,com.clickhouse:clickhouse-jdbc:<ver>

These tests intentionally reuse the exact production entry points
(read_kafka_flows, flows_from_json, start_clickhouse_export, probe,
setup_table) — nothing test-only in the pipeline under test; the
file-source suite (test_streaming.py) certifies identical semantics in CI.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

LIVE = os.environ.get("SPARK_GRAFT_LIVE") == "1"
KAFKA = os.environ.get("SPARK_GRAFT_KAFKA", "localhost:9092")
JDBC = os.environ.get("SPARK_GRAFT_CLICKHOUSE_JDBC", "")

pytestmark = pytest.mark.skipif(
    not LIVE, reason="live integration disabled (set SPARK_GRAFT_LIVE=1)"
)


@pytest.fixture(scope="module")
def live_spark():
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("kce-live-integration")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
    )
    pkgs = os.environ.get("SPARK_GRAFT_SPARK_PACKAGES")
    if pkgs:
        builder = builder.config("spark.jars.packages", pkgs)
    spark = builder.getOrCreate()
    yield spark
    spark.stop()


def _flow(i: int) -> dict:
    return {
        "TimeFlowStartMs": 1_700_000_000_000 + i,
        "TimeFlowEndMs": 1_700_000_000_500 + i,
        "SrcAddr": f"10.0.0.{i % 250}",
        "DstAddr": "10.0.1.1",
        "SrcK8S_Name": f"pod-{i}",
        "DstK8S_Name": "svc",
        "SrcK8S_Type": "Pod",
        "DstK8S_Type": "Service",
        "SrcK8S_Namespace": "ns-a",
        "DstK8S_Namespace": "ns-b",
        "Bytes": 100 + i,
        "Packets": 1 + i % 3,
    }


def test_kafka_consume_normalize_roundtrip(live_spark, tmp_path):
    """Produce NetObserv JSON onto a fresh topic through Spark's own Kafka
    sink, consume with read_kafka_flows (earliest offsets, reference
    S1/T2), normalize, and compare against the identical batch transform —
    the file-source equivalence test, now against a real broker."""
    from kafka_clickhouse_example_spark.operators.normalize import flows_from_json
    from kafka_clickhouse_example_spark.sources.kafka import read_kafka_flows

    topic = f"flows-live-{uuid.uuid4().hex[:8]}"
    rows = [(json.dumps(_flow(i)),) for i in range(50)]
    (
        live_spark.createDataFrame(rows, "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("topic", topic)
        .save()
    )

    stream = flows_from_json(
        read_kafka_flows(live_spark, KAFKA, topic=topic)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("live_flows")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {tuple(r) for r in live_spark.table("live_flows").collect()}
    want = {
        tuple(r)
        for r in flows_from_json(
            live_spark.createDataFrame(rows, "value string")
        ).collect()
    }
    assert got == want and len(got) == 50


def test_clickhouse_jdbc_roundtrip(live_spark, tmp_path):
    """S3/S7/S8 against a real server: DDL bootstrap over JDBC, streamed
    foreachBatch append with the default JDBC writer, probe + row-count
    read-back (the README verification loop, export_clickhouse.go:81-87)."""
    if not JDBC:
        pytest.skip("SPARK_GRAFT_CLICKHOUSE_JDBC not set")
    from kafka_clickhouse_example_spark.operators.normalize import flows_from_json
    from kafka_clickhouse_example_spark.sinks.clickhouse import (
        default_jdbc_writer,
        start_clickhouse_export,
    )

    table = f"flows_live_{uuid.uuid4().hex[:8]}"
    flow_dir = tmp_path / "in"
    flow_dir.mkdir()
    (flow_dir / "a.json").write_text(
        "\n".join(json.dumps(_flow(i)) for i in range(20)) + "\n"
    )

    from kafka_clickhouse_example_spark.sources.kafka import read_file_flows

    stream = flows_from_json(read_file_flows(live_spark, str(flow_dir)))
    q = start_clickhouse_export(
        stream,
        str(tmp_path / "ckpt"),
        writer=default_jdbc_writer(JDBC, table=table),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    back = (
        live_spark.read.format("jdbc")
        .option("url", JDBC)
        .option("dbtable", table)
        .load()
    )
    assert back.count() == 20
    assert set(back.columns) >= {"src_ip", "dst_ip", "bytes", "packets"}
