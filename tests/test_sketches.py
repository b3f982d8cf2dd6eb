"""Count-Min sketch contracts: one-sided error, the epsilon bound, and
exact mergeability (the properties the rows-only registry entry rests on)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import sketches as SK


def _events(spark, sf_dir):
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

    return load_compute_table(spark, sf_dir, "events")


def test_cms_never_undercounts_and_bounded_overcount(spark, sf_dir):
    events = _events(spark, sf_dir)
    sketch = SK.cms_build(events, "user_id")
    probes = events.select("user_id").distinct()
    est = SK.cms_probe(sketch, probes, "user_id")
    true = events.groupBy("user_id").agg(F.count("*").alias("true_n"))
    rows = est.join(true, "user_id").collect()
    n_total = events.count()
    eps = math.e / SK.CMS_WIDTH
    assert rows
    for r in rows:
        assert r.est_n >= r.true_n, f"CMS undercounted {r.user_id}"
        assert r.est_n - r.true_n <= eps * n_total + 1, (
            f"CMS overcount beyond bound for {r.user_id}: {r.est_n} vs {r.true_n}"
        )


def test_cms_merge_equals_direct_build(spark, sf_dir):
    events = _events(spark, sf_dir)
    # split by day parity -> two partial sketches -> merge
    day = F.expr("unix_millis(ts) div 86400000")
    a = events.filter(day % 2 == 0)
    b = events.filter(day % 2 == 1)
    merged = SK.cms_merge([SK.cms_build(a, "user_id"), SK.cms_build(b, "user_id")])
    direct = SK.cms_build(events, "user_id")
    m = {(r.r, r.idx): r.cnt for r in merged.collect()}
    d = {(r.r, r.idx): r.cnt for r in direct.collect()}
    assert m == d  # merge is exact, cell for cell


def test_cms_absent_key_estimates_low(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(700)], "k int")
    sketch = SK.cms_build(df, "k")
    probes = spark.createDataFrame([(999999,)], "k int")
    est = SK.cms_probe(sketch, probes, "k").collect()[0]
    # an absent key can only collide into touched cells; with 7 keys in
    # 4x2048 cells the min cell must be empty
    assert est.est_n == 0


def test_cms_sketch_is_bounded(spark, sf_dir):
    events = _events(spark, sf_dir)
    n_cells = SK.cms_build(events, "event_id").count()  # worst case: unique keys
    assert n_cells <= SK.CMS_DEPTH * SK.CMS_WIDTH


def test_cms_streaming_matview_matches_batch(spark, sf_dir, tmp_path):
    """The streamed sketch (per-batch partials, exactly-once landing) is
    cell-for-cell identical to a batch build over the full history, and a
    replayed batch does not double-count."""
    from kafka_clickhouse_example_spark.sinks.backfill import (
        read_cms_matview,
        start_cms_matview,
    )

    events = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    # several input files -> several micro-batches (maxFilesPerTrigger=1)
    events.select("user_id").repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    partials = str(tmp_path / "partials")
    q = start_cms_matview(stream, "user_id", partials, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive

    streamed = {(r.r, r.idx): r.cnt for r in read_cms_matview(spark, partials).collect()}
    direct = {(r.r, r.idx): r.cnt for r in SK.cms_build(events, "user_id").collect()}
    assert streamed == direct

    # replay: re-landing a batch overwrites its own partial -> no drift
    import glob

    batch_dirs = sorted(glob.glob(partials + "/batch=*"))
    assert len(batch_dirs) >= 2, "expected multiple micro-batches"
    # collect the partial first: a lazy read of the same path we overwrite
    # would execute after the overwrite deleted its input files
    partial = spark.read.parquet(batch_dirs[0])
    replay = spark.createDataFrame(partial.collect(), partial.schema)
    replay.write.mode("overwrite").parquet(batch_dirs[0])
    replayed = {(r.r, r.idx): r.cnt for r in read_cms_matview(spark, partials).collect()}
    assert replayed == direct


def test_fanout_sink_identical_and_replay_safe(spark, sf_dir, tmp_path):
    from kafka_clickhouse_example_spark.sinks.backfill import start_fanout_sink

    events = _events(spark, sf_dir).select("event_id", "user_id")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    a, b = str(tmp_path / "sink_a"), str(tmp_path / "sink_b")
    q = start_fanout_sink(stream, [a, b], str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive
    # batch=<id> dirs read back as a partition column: project it away
    rows_a = sorted(tuple(r) for r in spark.read.parquet(a).select("event_id", "user_id").collect())
    rows_b = sorted(tuple(r) for r in spark.read.parquet(b).select("event_id", "user_id").collect())
    expect = sorted(tuple(r) for r in events.collect())
    assert rows_a == rows_b == expect

    # replaying one batch into one sink overwrites itself: no divergence
    import glob

    bdir = sorted(glob.glob(a + "/batch=*"))[0]
    part = spark.read.parquet(bdir)
    replay = spark.createDataFrame(part.collect(), part.schema)
    replay.write.mode("overwrite").parquet(bdir)
    assert sorted(tuple(r) for r in spark.read.parquet(a).select("event_id", "user_id").collect()) == expect
