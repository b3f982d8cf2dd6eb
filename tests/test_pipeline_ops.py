"""Unit tests for the training-pipeline operators added in round 2:
decontamination, repetition filters, and sequence packing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string, source string")


class TestDecontamination:
    def test_planted_overlap_is_flagged_with_count(self, spark):
        from kafka_clickhouse_example_spark.operators import decontam as DC

        leak = "alpha beta gamma delta"  # one 4-gram, shared verbatim
        train = _docs_df(
            spark,
            [
                (1, f"intro words {leak} trailing words here", "train"),
                (2, "totally unrelated content with no overlap at all", "train"),
                (3, f"{leak} {leak} repeated leak still one distinct gram", "train"),
            ],
        )
        ev = _docs_df(spark, [(100, f"benchmark question {leak} answer", "eval")])
        hits = {
            r["doc_id"]: r["n_shared_shingles"]
            for r in DC.contamination_hits(train, ev).collect()
        }
        assert 1 in hits and 3 in hits
        assert 2 not in hits
        # doc 3 repeats the leaked gram but shares exactly one DISTINCT gram
        assert hits[3] == 1

    def test_short_docs_yield_no_shingles(self, spark):
        from kafka_clickhouse_example_spark.operators import decontam as DC

        train = _docs_df(spark, [(1, "too short", "train")])
        ev = _docs_df(spark, [(2, "also very tiny", "eval")])
        assert DC.contamination_hits(train, ev).count() == 0


class TestRepetitionFilter:
    def test_degenerate_doc_dropped_normal_doc_kept(self, spark):
        from kafka_clickhouse_example_spark.operators import text as T

        normal = "the quick brown fox jumps over a lazy dog and then runs far away home"
        spammy = "buy now " * 20  # one bigram repeated: frac_dup_2grams ~ 1
        df = _docs_df(spark, [(1, normal, "s"), (2, spammy.strip(), "s")])
        out = {r["doc_id"]: r for r in T.with_repetition_metrics(df).collect()}
        assert out[1]["keep"] is True
        assert out[2]["keep"] is False
        assert out[2]["frac_dup_2grams"] > 0.9
        assert out[2]["frac_top_token"] == 0.5
        assert out[1]["frac_dup_tokens"] < out[2]["frac_dup_tokens"]

    def test_metrics_match_python_reference(self, spark):
        from kafka_clickhouse_example_spark.operators import text as T

        text = "a b a b c a a x y z"
        df = _docs_df(spark, [(1, text, "s")])
        r = T.with_repetition_metrics(df).collect()[0]
        toks = text.split(" ")
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        assert r["n_tokens"] == len(toks)
        assert abs(r["frac_dup_tokens"] - (1 - len(set(toks)) / len(toks))) < 1e-15
        assert abs(r["frac_dup_2grams"] - (1 - len(set(g2)) / len(g2))) < 1e-15
        assert abs(r["frac_top_token"] - 4 / len(toks)) < 1e-15
        assert abs(r["mean_token_len"] - 1.0) < 1e-15


class TestSequencePacking:
    def test_offsets_are_exact_prefix_sums_any_partitioning(self, spark):
        from kafka_clickhouse_example_spark.operators import packing as PK

        rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, schema="doc_id long, n_tokens long")
        out = (
            PK.with_stream_offsets(df.repartition(7), "n_tokens", ["doc_id"])
            .orderBy("doc_id")
            .collect()
        )
        acc = 0
        for r, (_, w) in zip(out, rows):
            assert r["start_offset"] == acc
            acc += w

    def test_chunk_arithmetic_and_boundary_straddle(self, spark):
        from kafka_clickhouse_example_spark.operators import packing as PK

        df = spark.createDataFrame(
            [(1, 500), (2, 24), (3, 100), (4, 0)],
            schema="doc_id long, n_tokens long",
        )
        out = {r["doc_id"]: r for r in PK.with_pack_chunks(df, ctx=512).collect()}
        assert (out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 0)
        # doc 2 spans tokens [500, 524) -> straddles the 512 boundary
        assert (out[2]["first_chunk"], out[2]["last_chunk"], out[2]["n_chunks"]) == (
            0,
            1,
            2,
        )
        assert (out[3]["first_chunk"], out[3]["last_chunk"]) == (1, 1)
        # zero-weight doc pins to its boundary chunk, empty span
        assert (out[4]["first_chunk"], out[4]["last_chunk"], out[4]["n_chunks"]) == (
            1,
            1,
            1,
        )

    def test_no_single_partition_window_in_plan(self, spark):
        from kafka_clickhouse_example_spark.operators import packing as PK

        df = spark.range(100).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
        )
        plan = (
            PK.with_pack_chunks(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "SinglePartition" not in plan


class TestIncrementalDedup:
    def test_cross_batch_pair_found_corpus_internal_ignored(self, spark):
        from kafka_clickhouse_example_spark.operators import dedup as D

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        near = base + " extra"
        corpus = _docs_df(
            spark,
            [
                (1, base, "old"),
                (2, base, "old"),  # corpus-internal exact dup: must NOT appear
                (3, "totally different words with no shared shingles here", "old"),
            ],
        )
        new = _docs_df(spark, [(100, near, "new")])
        rows = D.incremental_minhash_pairs(new, corpus, 0.3).collect()
        got = {(r["new_id"], r["corpus_id"]) for r in rows}
        assert got == {(100, 1), (100, 2)}
        for r in rows:
            assert r["jaccard"] > 0.7

    def test_corpus_is_never_shuffled_or_sortmerged(self, spark):
        from kafka_clickhouse_example_spark.operators import dedup as D

        corpus = _docs_df(spark, [(i, f"w{i} x{i} y{i} z{i} q{i}", "old") for i in range(50)])
        new = _docs_df(spark, [(99, "w1 x1 y1 z1 q1", "new")])
        plan = (
            D.incremental_minhash_pairs(new, corpus, 0.3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan
        # the only hash exchange allowed is the candidate-list distinct
        import re

        ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert all("new_id" in e or "corpus_id" in e for e in ex), ex


class TestTokenQuota:
    def test_boundary_doc_kept_and_budget_independent_per_group(self, spark):
        from kafka_clickhouse_example_spark.operators import sampling as SP

        rows = [
            (1, "a", 400), (2, "a", 500), (3, "a", 200),  # cum-before: 0, 400, 900
            (4, "b", 1500),                                # 0 -> kept despite size
            (5, "b", 1),                                   # 1500 -> dropped
        ]
        df = spark.createDataFrame(rows, schema="doc_id long, source string, n_tokens long")
        out = SP.with_token_quota(df, 1000).orderBy("doc_id").collect()
        kept = [r["doc_id"] for r in out]
        assert kept == [1, 2, 3, 4]
        assert [r["tokens_before"] for r in out] == [0, 400, 900, 0]

    def test_partitioning_invariant(self, spark):
        from kafka_clickhouse_example_spark.operators import sampling as SP

        rows = [(i, f"s{i % 5}", (i * 13) % 70 + 1) for i in range(300)]
        df = spark.createDataFrame(rows, schema="doc_id long, source string, n_tokens long")
        a = sorted(map(tuple, SP.with_token_quota(df, 500).collect()))
        b = sorted(map(tuple, SP.with_token_quota(df.repartition(13), 500).collect()))
        assert a == b and len(a) > 0


def test_backfill_overwrites_only_incoming_partitions(spark, tmp_path):
    """Dynamic partition overwrite: re-running a day's job replaces that
    day's partition and leaves the others byte-identical; double-running
    is idempotent."""
    from kafka_clickhouse_example_spark.sinks.backfill import overwrite_partitions

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10), ("2024-01-01", 2, 20), ("2024-01-02", 3, 30)],
        "day string, id int, v int",
    )
    overwrite_partitions(base, path, ["day"])

    # Backfill day 1 with corrected values (row 2 dropped, row 1 changed).
    fix = spark.createDataFrame([("2024-01-01", 1, 11)], "day string, id int, v int")
    overwrite_partitions(fix, path, ["day"])
    # partition-column type inference reads `day` back as DATE; compare str
    got = {(str(r.day), r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01-01", 1, 11), ("2024-01-02", 3, 30)}

    # Idempotency: the same backfill again changes nothing.
    overwrite_partitions(fix, path, ["day"])
    again = {(str(r.day), r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert again == got


def test_kmv_sketch_merge_is_lossless_and_accurate(spark, sf_correctness_dir):
    """Union of per-day KMV bottom-k sketches must estimate EXACTLY what
    the direct whole-relation sketch estimates (min-wise merge), and both
    must sit within ~3 std errors (30% at k=128) of the exact distinct
    count. (Until round 6 this query was Datasketches HLL — that exact-
    merge pin now lives in tests/test_sketches.py; the registered query
    uses the engine-portable KMV so the driver hash-certifies it.)"""
    from kafka_clickhouse_example_spark.registry import all_queries
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table
    from pyspark.sql import functions as F

    row = all_queries()["events_daily_users_sketch_merge"](
        spark, sf_correctness_dir
    ).first()
    assert row.merged_estimate == row.direct_estimate
    assert row.n_components > 1  # the merge actually merged something
    exact = (
        load_compute_table(spark, sf_correctness_dir, "events")
        .select(F.countDistinct("user_id").alias("n"))
        .first()
        .n
    )
    assert abs(row.merged_estimate - exact) <= 0.30 * exact


def test_hsq_merged_quantiles_within_rank_error(spark, sf_correctness_dir):
    """The registry's quantile-sketch query (per-day HSQ sketches merged by
    global re-threshold) must report p50/p95/p99 whose true RANK sits
    within 3 sigma of the Bernoulli sampling bound at the retained-count
    floor (m > HSQ_K/2 = 512: sigma(q) = sqrt(q(1-q)/512)), and n must be
    exact. Values themselves are oracle-certified; this pins the sketch's
    statistical contract against the EXACT order statistics."""
    from kafka_clickhouse_example_spark.registry import all_queries
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table
    from pyspark.sql import functions as F

    row = all_queries()["events_value_quantiles_kll"](spark, sf_correctness_dir).first()
    ev = load_compute_table(spark, sf_correctness_dir, "events")
    n = ev.count()
    assert row.n_values == n
    for q, est in ((0.5, row.p50), (0.95, row.p95), (0.99, row.p99)):
        rank = ev.filter(F.col("value") <= est).count() / n
        eps = 3 * (q * (1 - q) / 512) ** 0.5
        assert abs(rank - q) <= eps, (q, est, rank, eps)


def test_datasketches_kll_merged_quantiles_within_rank_error(
    spark, sf_correctness_dir
):
    """The built-in Datasketches KLL surface, pinned with the construction
    the registry query used before its HSQ upgrade: per-day sketches,
    deterministic sorted-fold merge, merged p50/p95 within the k=200
    normalized rank error (~1.65%, doubled for the merge) of the exact
    order statistics, n exact."""
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table
    from pyspark.sql import functions as F

    ev = load_compute_table(spark, sf_correctness_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = daily.agg(F.sort_array(F.collect_list("sk")).alias("sks")).select(
        F.expr(
            "reduce(slice(sks, 2, size(sks) - 1), sks[0], "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("msk")
    )
    row = merged.select(
        F.kll_sketch_get_quantile_double("msk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("msk", F.lit(0.95)).alias("p95"),
        F.kll_sketch_get_n_double("msk").alias("n_values"),
    ).first()
    n = ev.count()
    assert row.n_values == n
    eps = 2 * 0.0165
    for q, est in ((0.5, row.p50), (0.95, row.p95)):
        rank = ev.filter(F.col("value") <= est).count() / n
        assert abs(rank - q) <= eps, (q, est, rank)


def test_write_training_shards_caps_rows_per_file(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from kafka_clickhouse_example_spark.operators.packing import write_training_shards

    df = spark.range(1000).selectExpr("id", "id % 7 as k")
    out = str(tmp_path / "shards")
    n = write_training_shards(df, out, rows_per_shard=128, order_cols=["id"])
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) == n
    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert all(c <= 128 for c in counts)
    assert sum(counts) == 1000
    # stable global order: each shard's id range is disjoint and sorted
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["id"]).column("id").to_pylist()
        assert t == sorted(t)
        ranges.append((t[0], t[-1]))
    ranges.sort()
    for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
        assert b1 < a2


@pytest.mark.slow
def test_incremental_minhash_equals_batch_on_random_ingest(spark):
    """Property test for the incremental-vs-batch dedup contract: over a
    randomly grown corpus (mutation families planted so near-dups
    actually occur, plus sub-shingle-length docs), each ingested batch's
    incremental pairs must equal the batch-mode minhash_lsh_pairs over
    the union, restricted to pairs spanning (new x corpus) — same
    signatures, same banding, same exact-verify, per the operator's
    documented agreement contract."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_clickhouse_example_spark.operators import dedup as D

    BASES = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet ultra infra deep",
    ]

    def mutate(data, base, label):
        words = base.split()
        mode = data.draw(
            st.sampled_from(["same", "append", "swap", "drop", "tiny"]),
            label=label,
        )
        if mode == "append":
            words = words + ["extra"]
        elif mode == "swap":
            words = words[:]
            words[data.draw(st.integers(0, len(words) - 1), label="wi")] = "sub"
        elif mode == "drop":
            words = words[1:]
        elif mode == "tiny":
            words = words[:2]  # below shingle length: no shingles at all
        return " ".join(words)

    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def run(data):
        next_id = {"v": 0}

        def draw_docs(n, label):
            out = []
            for _ in range(n):
                base = data.draw(st.sampled_from(BASES), label=f"{label}_base")
                out.append(
                    (next_id["v"], mutate(data, base, f"{label}_mut"), "s")
                )
                next_id["v"] += 1
            return out

        corpus_rows = draw_docs(data.draw(st.integers(2, 4), label="n0"), "c")
        for _ in range(data.draw(st.integers(1, 3), label="n_ingests")):
            new_rows = draw_docs(data.draw(st.integers(1, 3), label="k"), "n")
            corpus_ids = {r[0] for r in corpus_rows}
            new_ids = {r[0] for r in new_rows}
            inc = {
                (r.new_id, r.corpus_id, r.n_common, r.jaccard)
                for r in D.incremental_minhash_pairs(
                    _docs_df(spark, new_rows), _docs_df(spark, corpus_rows), 0.3
                ).collect()
            }
            batch = {
                # orient batch pairs as (new, corpus); ids are disjoint
                (r.id2, r.id1, r.n_common, r.jaccard)
                if r.id2 in new_ids
                else (r.id1, r.id2, r.n_common, r.jaccard)
                for r in D.minhash_lsh_pairs(
                    _docs_df(spark, corpus_rows + new_rows), 0.3
                ).collect()
                if (r.id1 in new_ids) != (r.id2 in new_ids)
            }
            assert inc == batch
            corpus_rows += new_rows  # the batch is absorbed

    run()
