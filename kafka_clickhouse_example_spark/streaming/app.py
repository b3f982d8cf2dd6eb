"""Process entry point: the Spark equivalent of the reference's ``main``
(cmd/main.go:14-42).

Flag parity (cmd/main.go:16-22):
  -loglevel      -> --loglevel   (Spark log level)
  -kafkaurl      -> --kafkaurl   (bootstrap servers; or --filesource DIR)
  -clickhouseurl -> --clickhouseurl  (empty => stdout sink, S6 branch at
                                      cmd/main.go:37-41)

Run:  python -m kafka_clickhouse_example_spark.streaming.app \
          --kafkaurl broker:9092 --clickhouseurl jdbc:ch://host:8123/default
"""

from __future__ import annotations

import argparse

from kafka_clickhouse_example_spark.session import get_spark
from kafka_clickhouse_example_spark.sinks.clickhouse import (
    default_jdbc_writer,
    start_clickhouse_export,
)
from kafka_clickhouse_example_spark.sinks.console import start_console
from kafka_clickhouse_example_spark.sources.kafka import read_file_flows, read_kafka_flows
from kafka_clickhouse_example_spark.streaming.pipeline import (
    normalized_stream,
    run_until_signal,
)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="NetObserv flows -> ClickHouse (Spark)")
    ap.add_argument("--loglevel", default="info")  # cmd/main.go:17
    ap.add_argument("--kafkaurl", default="")  # cmd/main.go:19
    ap.add_argument("--filesource", default="", help="dir of JSON-lines files (test/backfill)")
    ap.add_argument("--clickhouseurl", default="")  # cmd/main.go:21; empty => stdout
    ap.add_argument("--checkpoint", default="/tmp/kce-spark-checkpoint")
    args = ap.parse_args(argv)

    spark = get_spark("kafka-clickhouse-example")
    spark.sparkContext.setLogLevel(args.loglevel.upper())

    if args.filesource:
        raw = read_file_flows(spark, args.filesource)
    else:
        raw = read_kafka_flows(spark, args.kafkaurl)
    flows = normalized_stream(raw)

    if not args.clickhouseurl:  # cmd/main.go:37-38: stdout sink
        query = start_console(flows)
    else:  # cmd/main.go:40: ClickHouse sink
        query = start_clickhouse_export(
            flows, args.checkpoint, default_jdbc_writer(args.clickhouseurl)
        )
    run_until_signal(query)


if __name__ == "__main__":
    main()
