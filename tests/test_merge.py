"""MERGE/upsert into partitioned parquet: latest-version-wins semantics,
partition pruning (untouched partition files byte-identical), idempotency."""

from __future__ import annotations

import glob
from pathlib import Path

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.sinks.merge import (
    apply_upserts,
    merge_into_partitioned,
)


def _rows(spark, path):
    return {
        (r.k, r.day): (r.v, r.ver)
        for r in spark.read.parquet(path).collect()
    }


def test_apply_upserts_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, ver int"
    )
    # key 1 updated twice in one batch (versions 2 then 3), key 4 inserted,
    # key 2 carries a STALE replay (ver 0) that must NOT clobber the base.
    ups = spark.createDataFrame(
        [(1, "a2", 2), (1, "a3", 3), (4, "d", 1), (2, "b0", 0)],
        "k int, v string, ver int",
    )
    got = {
        r.k: (r.v, r.ver)
        for r in apply_upserts(base, ups, ["k"], version_col="ver").collect()
    }
    assert got == {1: ("a3", 3), 2: ("b", 1), 3: ("c", 1), 4: ("d", 1)}

    # without version_col, updates always supersede base
    got2 = {r.k: r.v for r in apply_upserts(base, ups.filter("ver != 3"), ["k"]).collect()}
    assert got2[2] == "b0"


def test_merge_into_partitioned_prunes_and_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(1, "a", 1, "d1"), (2, "b", 1, "d1"), (3, "c", 1, "d2"), (4, "d", 1, "d3")],
        "k int, v string, ver int, day string",
    )
    base.write.partitionBy("day").parquet(path)
    untouched_files = {
        f: Path(f).read_bytes() for f in glob.glob(path + "/day=d3/*.parquet")
    }

    ups = spark.createDataFrame(
        [(1, "a2", 2, "d1"), (5, "e", 1, "d2")], "k int, v string, ver int, day string"
    )
    n = merge_into_partitioned(spark, path, ups, ["k"], "day", version_col="ver")
    assert n == 2
    assert _rows(spark, path) == {
        (1, "d1"): ("a2", 2),
        (2, "d1"): ("b", 1),
        (3, "d2"): ("c", 1),
        (5, "d2"): ("e", 1),
        (4, "d3"): ("d", 1),
    }
    # untouched partition: same files, byte-identical (never rewritten)
    for f, content in untouched_files.items():
        assert Path(f).read_bytes() == content, "untouched partition was rewritten"

    # replaying the same updates changes nothing
    n2 = merge_into_partitioned(spark, path, ups, ["k"], "day", version_col="ver")
    assert n2 == 2
    assert _rows(spark, path) == {
        (1, "d1"): ("a2", 2),
        (2, "d1"): ("b", 1),
        (3, "d2"): ("c", 1),
        (5, "d2"): ("e", 1),
        (4, "d3"): ("d", 1),
    }

    # empty updates: no-op, zero partitions rewritten
    assert (
        merge_into_partitioned(spark, path, ups.filter(F.lit(False)), ["k"], "day")
        == 0
    )


def test_streaming_upsert_sink_exactly_once_effective(spark, tmp_path):
    """CDC stream -> MERGE sink: cross-batch updates resolve to latest
    version, and REPLAYING the stream from scratch (fresh checkpoint, same
    data — the at-least-once worst case) leaves the table byte-for-byte
    content-identical: version-wins merging makes delivery effectively
    exactly-once."""
    import json

    from kafka_clickhouse_example_spark.sinks.merge import start_upsert_sink

    src = tmp_path / "cdc"
    src.mkdir()
    b1 = [
        {"k": 1, "v": "a", "ver": 1, "day": "d1"},
        {"k": 2, "v": "b", "ver": 1, "day": "d1"},
        {"k": 1, "v": "a2", "ver": 2, "day": "d1"},  # same-batch supersede
    ]
    b2 = [
        {"k": 2, "v": "b0", "ver": 0, "day": "d1"},  # stale replay
        {"k": 3, "v": "c", "ver": 1, "day": "d2"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))

    schema = "k int, v string, ver int, day string"
    table = str(tmp_path / "table")

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = start_upsert_sink(stream, table, ["k"], "day", ckpt, version_col="ver")
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    want = {(1, "a2", 2, "d1"), (2, "b", 1, "d1"), (3, "c", 1, "d2")}
    got = {tuple(r) for r in spark.read.parquet(table).select("k", "v", "ver", "day").collect()}
    assert got == want

    # full replay with a FRESH checkpoint: every batch re-applies; content
    # must not change (no duplicates, no stale clobbers)
    run(str(tmp_path / "ckpt2"))
    got2 = {tuple(r) for r in spark.read.parquet(table).select("k", "v", "ver", "day").collect()}
    assert got2 == want
