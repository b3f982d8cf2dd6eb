"""Custom Python DataSource (Spark 4 DataSource API): NetObserv JSONL.

The reference's only input is a Kafka topic of NetObserv JSON messages
(ingest_kafka.go:14-50); landed-to-storage exports of the same messages are
the batch equivalent. This connector surfaces a directory of .json/.jsonl
files through Spark's pluggable Python DataSource API as the SAME
``value``-column contract the Kafka source produces
(sources/kafka.py), so the whole downstream pipeline (decode -> normalize
-> analytics) is byte-identical regardless of transport:

    spark.dataSource.register(NetObservJsonlDataSource)
    raw = spark.read.format("netobserv_jsonl").option("path", dir).load()
    flows = decode_flows(raw)

Scale design: one InputPartition per file — Spark schedules file-level
tasks exactly like its native file sources, so a directory of N files
scans with min(N, slots) parallelism and no driver-side data movement
(the driver only lists the directory). Each task streams its file line
by line; memory is O(line), not O(file).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class NetObservJsonlReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("netobserv_jsonl requires .option('path', dir)")

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith((".json", ".jsonl"))
        )
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        if partition is None:  # empty dir: Spark still invokes read once
            return
        src = os.path.basename(partition.path)
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    yield (line, src)


class NetObservJsonlDataSource(DataSource):
    """`format("netobserv_jsonl")`: value-per-line flow messages + source
    file, same `value` contract as the Kafka source."""

    @classmethod
    def name(cls) -> str:
        return "netobserv_jsonl"

    def schema(self) -> str:
        return "value string, src_file string"

    def reader(self, schema) -> DataSourceReader:
        return NetObservJsonlReader(self.options)
