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
