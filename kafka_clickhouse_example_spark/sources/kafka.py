"""Kafka streaming source (reference parity S1/S2, SURVEY.md §2.1).

Reference behavior reproduced (pkg/kafka/ingest_kafka.go:14-50):

- topic ``flows-export``, consumer start at earliest offset
  (ingest_kafka.go:18,20) -> ``subscribe`` + ``startingOffsets=earliest``.
- round-robin group balancing over 24 partitions x N consumers
  (ingest_kafka.go:19, contrib/kafka.yaml:52) -> Spark's Kafka source spawns
  one task per topic partition; no consumer-group code needed.
- 500 ms async offset auto-commit (ingest_kafka.go:21) -> *replaced* by
  checkpoint-atomic offset tracking (the reference's commit-vs-insert race,
  SURVEY.md §2.9 T1, is a bug we deliberately fix): offsets advance only when
  the micro-batch that read them commits.
- decode failure -> log + drop (ingest_kafka.go:40-42) -> PERMISSIVE
  ``from_json`` + corrupt-record filter in operators.normalize.decode_flows.

Scale: source parallelism == topic partitions (24 in the reference deploy;
thousands in prod). ``maxOffsetsPerTrigger`` bounds per-batch work, which is
the backpressure the reference got implicitly from its unbuffered channel
(cmd/main.go:34) — here it is explicit and tunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TOPIC = "flows-export"  # ingest_kafka.go:18


def read_kafka_flows(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    *,
    starting_offsets: str = "earliest",  # ingest_kafka.go:20 FirstOffset
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """``readStream`` from Kafka; returns the raw frame with ``value: binary``.

    Feed the result to ``operators.normalize.flows_from_json`` to get the
    12-column flows relation. Requires the spark-sql-kafka package on the
    session's classpath (not bundled in this container — exercised in real
    deployments; the file/rate sources below cover local tests).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def read_file_flows(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source stand-in for Kafka: a directory of text files, one JSON
    flow message per line, surfaced with the same ``value`` column the Kafka
    source produces so the downstream pipeline is byte-identical.

    This is the test harness for the streaming spine (no broker in CI), and
    also a legitimate prod path (flows landed to object storage).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)  # text source already yields a `value` column
