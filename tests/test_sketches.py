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


# --- KMV bottom-k distinct sketch (round 6) ---------------------------------


def test_kmv_merge_equals_direct_build(spark, sf_dir):
    """Min-wise property: bottom-k of a union == bottom-k of the unioned
    per-part bottom-k sketches, row for row."""
    events = _events(spark, sf_dir)
    a = events.filter(F.col("event_type") == "click")
    b = events.filter(F.col("event_type") != "click")
    merged = SK.kmv_merge(
        [SK.kmv_build(a, "user_id"), SK.kmv_build(b, "user_id")]
    )
    direct = SK.kmv_build(events, "user_id")
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )


def test_kmv_grouped_two_phase_equals_single_window(spark):
    """The salted two-phase rank (kmv_build_grouped) must reproduce the
    naive per-group bottom-k EXACTLY — bottom-k decomposability — across
    groups below k, straddling k, and far above a salt cell's k quota
    (where phase 1's per-cell cut is actually load-bearing)."""
    from pyspark.sql import Window

    k = 8
    # Keys derive from floor(id/3), which is INDEPENDENT of the id%3 group
    # split (id%X with X a multiple of 3 is not — it collapses to one
    # residue class per group; review finding). g0: 3 distinct keys (< k);
    # g1: 20 (> k, < SALT*k); g2: 600 (> SALT*k=256 — salt cells average
    # ~19 > k, so phase 1's per-cell cut is load-bearing).
    q = F.floor(F.col("id") / 3)
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.when(F.col("id") % 3 == 0, q % 3)
        .when(F.col("id") % 3 == 1, (q % 20) + 1000)
        .otherwise((q % 600) + 100000)
        .alias("k"),
    )
    got = SK.kmv_build_grouped(df, ["g"], "k", k=k)
    naive = (
        df.select("g", SK.kmv_hash(F.col("k")).alias("h"))
        .distinct()
        .withColumn(
            "_rn", F.row_number().over(Window.partitionBy("g").orderBy("h"))
        )
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    assert sorted((r.g, r.h) for r in got.collect()) == sorted(
        (r.g, r.h) for r in naive.collect()
    )


def test_kmv_grouped_rejects_reserved_group_columns(spark):
    """Group columns named 'h' or '_rn' would collide with the sketch's
    internal columns (duplicate-column error / silently-dropped key) —
    the guard must raise the named error instead (same contract as
    ranking/packing, ADVICE r5)."""
    import pytest as _pytest

    df = spark.range(0, 10).select(
        F.col("id").alias("h"), (F.col("id") % 3).alias("v")
    )
    with _pytest.raises(ValueError, match="reserved"):
        SK.kmv_build_grouped(df, ["h"], "v", k=4)


def test_kmv_exact_mode_below_k(spark):
    """With fewer than k distinct keys the sketch IS the distinct hash set
    and the estimate is the exact count."""
    df = spark.range(0, 50).select((F.col("id") % 7).alias("k"))
    sk = SK.kmv_build(df, "k")
    est = sk.agg(
        SK.kmv_estimate_col(F.count("*"), F.max("h")).alias("est")
    ).first()
    assert est.est == 7.0


def test_kmv_estimator_accuracy(spark):
    """Estimator branch (n >> k): within 3 std errors (~27% at k=128)."""
    n = 5000
    df = spark.range(0, n).select(F.col("id").alias("k"))
    sk = SK.kmv_build(df, "k")
    est = sk.agg(
        SK.kmv_estimate_col(F.count("*"), F.max("h")).alias("est")
    ).first()
    assert sk.count() == SK.KMV_K
    assert abs(est.est - n) <= 0.27 * n, est.est


# --- Engine-specific sketch family: pinned here since round 6 moved the
# --- registered queries to engine-portable constructions the driver can
# --- hash-certify. These remain the right tools when no cross-engine
# --- oracle is needed.


def test_datasketches_hll_union_merge_is_lossless(spark, sf_dir):
    """Per-day Datasketches-HLL sketches unioned (register-wise max) must
    estimate EXACTLY what the direct whole-relation sketch estimates, and
    sit within 5% of exact (the pin formerly carried by the registered
    events_daily_users_sketch_merge query)."""
    events = _events(spark, sf_dir)
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est")
    ).first()
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long").alias("est")
    ).first()
    exact = events.select(F.countDistinct("user_id")).first()[0]
    assert merged.est == direct.est
    assert abs(merged.est - exact) <= 0.05 * exact


def test_builtin_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL++ per-type approx distinct within 5% of exact (formerly the
    registered events_user_cardinality_approx query)."""
    events = _events(spark, sf_dir)
    got = {
        r.event_type: (r.approx, r.exact)
        for r in events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    assert got
    for t, (approx, exact) in got.items():
        assert abs(approx - exact) <= 0.05 * exact, (t, approx, exact)


def test_builtin_percentile_approx_vs_exact(spark, sf_dir):
    """percentile_approx(10000) per type within 1% of the exact percentile
    (formerly the registered events_value_percentiles_approx query)."""
    events = _events(spark, sf_dir)
    rows = (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("ap50"),
            F.percentile(F.col("value"), F.lit(0.5)).alias("ep50"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.ap50 - r.ep50) <= 0.01 * max(abs(r.ep50), 1.0), r


def test_cms_matview_compaction_preserves_sketch(spark, sf_dir, tmp_path):
    """compact_partials is state-agnostic: the CMS matview compacts with
    the same manifest protocol, and the merged sketch is cell-identical."""
    from kafka_clickhouse_example_spark.sinks.backfill import (
        compact_partials,
        read_cms_matview,
        start_cms_matview,
    )

    events = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    events.select("user_id").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    partials = str(tmp_path / "partials")
    q = start_cms_matview(stream, "user_id", partials, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    before = {(r.r, r.idx): r.cnt for r in read_cms_matview(spark, partials).collect()}
    compact_partials(spark, partials, read_cms_matview)
    after = {(r.r, r.idx): r.cnt for r in read_cms_matview(spark, partials).collect()}
    assert after == before
    import glob

    # epoch dir + the retained newest batch (the only replayable one)
    assert len(glob.glob(partials + "/batch=*")) == 2


# --- HSQ: the hash-sampled quantile sketch ----------------------------------


def test_hsq_merge_equals_direct_build(spark):
    """The exact-merge property (the KMV argument transposed to levels):
    per-group sketches at local thresholds, merged by global re-threshold,
    must answer quantiles IDENTICALLY to a single whole-input sketch —
    value-for-value, not within-error."""
    df = spark.range(30000).selectExpr(
        "id AS k",
        "CAST(pmod(id * 2654435761, 100000) AS DOUBLE) / 10 AS v",
        "pmod(id, 13) AS g",
    )
    qs = {"p50": (1, 2), "p95": (19, 20), "p99": (99, 100)}
    sk_g, n_g = SK.hsq_build_grouped(df, ["g"], "v", "k")
    merged = SK.hsq_merge_quantiles(sk_g.drop("g"), n_g, qs).first()
    sk_d, n_d = SK.hsq_build_grouped(df.selectExpr("k", "v", "1 AS one"), ["one"], "v", "k")
    direct = SK.hsq_merge_quantiles(sk_d.drop("one"), n_d, qs).first()
    assert merged == direct


def test_hsq_exact_mode_below_k(spark):
    """n <= HSQ_K => threshold 0, every row retained: the sketch IS the
    input and quantiles are the exact ceiling-rank order statistics."""
    n = 500
    assert n <= SK.HSQ_K
    df = spark.range(n).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v", "1 AS g")
    sk, cnt = SK.hsq_build_grouped(df, ["g"], "v", "k")
    assert sk.count() == n
    row = SK.hsq_merge_quantiles(
        sk.drop("g"), cnt, {"p50": (1, 2), "p95": (19, 20)}
    ).first()
    # exact order statistics: min v with rank >= ceil(q*n) over 0..499
    assert row.p50 == 249.0  # ceil(500/2) = 250th value
    assert row.p95 == 474.0  # ceil(475) = 475th value
    assert row.n_values == n


def test_hsq_is_exactly_layout_insensitive(spark):
    """Survival depends only on row content: rebuilding under a different
    partitioning yields the byte-identical retained set (the property that
    let the registry query leave the relayout-exception list)."""
    df = spark.range(20000).selectExpr(
        "id AS k", "CAST(pmod(id * 48271, 7919) AS DOUBLE) AS v", "1 AS g"
    )
    sk1, _ = SK.hsq_build_grouped(df.repartition(1), ["g"], "v", "k")
    sk2, _ = SK.hsq_build_grouped(df.repartition(17, "v"), ["g"], "v", "k")
    a = sorted((r.v, r.h) for r in sk1.collect())
    b = sorted((r.v, r.h) for r in sk2.collect())
    assert a == b and len(a) > 0


def test_hsq_ignores_null_values(spark):
    """NULL values are excluded from the sketch AND the count (the
    Datasketches-KLL semantics, and the only ordering both engines agree
    on): quantiles over the non-NULL domain, n_values = non-NULL count."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(1000 + i, None) for i in range(50)],
        "k long, v double",
    ).selectExpr("k", "v", "1 AS g")
    sk, cnt = SK.hsq_build_grouped(df, ["g"], "v", "k")
    row = SK.hsq_merge_quantiles(sk.drop("g"), cnt, {"p50": (1, 2)}).first()
    assert row.n_values == 100
    assert row.p50 == 49.0  # exact mode: ceil(100/2)=50th of 0..99


def test_hsq_empty_input_reports_zero(spark):
    df = spark.createDataFrame([], "k long, v double, g int")
    sk, cnt = SK.hsq_build_grouped(df, ["g"], "v", "k")
    row = SK.hsq_merge_quantiles(sk.drop("g"), cnt, {"p50": (1, 2)}).first()
    assert row.n_values == 0
    assert row.p50 is None
