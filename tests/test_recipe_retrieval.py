"""Invariant tests for the round-4 additions: BM25 retrieval, the
training-data mixture planner, and deterministic shuffle-to-shards.

The oracle-parity replica certifies value equality vs DuckDB; these tests
pin the SEMANTIC contracts (ranking sanity, budget/cap algebra, shard
partition laws) and the plan shapes that make them scale.
"""

from __future__ import annotations

from kafka_clickhouse_example_spark.plans.queries_corpus import (
    MIX_EPOCH_CAP_DEN,
    MIX_EPOCH_CAP_NUM,
    corpus_mixture_plan,
)
from kafka_clickhouse_example_spark.plans.queries_sampling import (
    N_SHARDS,
    sample_shuffle_shards,
)
from kafka_clickhouse_example_spark.plans.queries_text import (
    BM25_TERMS,
    BM25_TOP_K,
    text_bm25_topk,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBm25:
    def test_hits_are_real_and_bounded(self, spark, sf_dir):
        rows = text_bm25_topk(spark, sf_dir).collect()
        assert 0 < len(rows) <= BM25_TOP_K
        for r in rows:
            assert 1 <= r.n_terms <= len(BM25_TERMS)
            assert r.score > 0.0

    def test_scores_descend(self, spark, sf_dir):
        scores = [r.score for r in text_bm25_topk(spark, sf_dir).collect()]
        assert scores == sorted(scores, reverse=True)

    def test_topk_is_take_ordered_with_broadcasts(self, spark, sf_dir):
        plan = _plan(text_bm25_topk(spark, sf_dir))
        # top-k must be TakeOrdered (per-partition heaps), never a global Sort
        assert "TakeOrderedAndProject" in plan
        # df (<= |Q| rows) hash-joins broadcast; corpus stats (1 row)
        # cross-joins as an IdentityBroadcast — two BroadcastExchanges, no
        # shuffle join anywhere after the tf aggregation
        assert plan.count("BroadcastExchange") >= 2
        assert "SortMergeJoin" not in plan


class TestMixturePlan:
    def test_budget_and_cap_algebra(self, spark, sf_dir):
        rows = corpus_mixture_plan(spark, sf_dir).collect()
        assert rows, "planner returned no sources"
        total_avail = sum(r.avail_tokens for r in rows)
        budget = total_avail // 2
        wsum = sum(r.weight for r in rows)
        for r in rows:
            cap = (MIX_EPOCH_CAP_NUM * r.avail_tokens) // MIX_EPOCH_CAP_DEN
            assert r.allotted_tokens == (budget * r.weight) // wsum
            assert r.realized_tokens == min(r.allotted_tokens, cap)
            assert r.deficit_tokens == r.allotted_tokens - r.realized_tokens
            assert r.deficit_tokens >= 0
            assert r.epochs <= MIX_EPOCH_CAP_NUM / MIX_EPOCH_CAP_DEN + 1e-9
        # integer-div shares can only round DOWN: never over-allocate
        assert sum(r.allotted_tokens for r in rows) <= budget

    def test_cap_actually_binds(self, spark, sf_dir):
        """The 5/4-epoch cap must bind for at least one 4x source — a cap no
        input reaches is a dead branch the oracle can't certify."""
        rows = corpus_mixture_plan(spark, sf_dir).collect()
        assert any(r.deficit_tokens > 0 for r in rows)


class TestShuffleShards:
    def test_partition_laws(self, spark, sf_dir):
        rows = sample_shuffle_shards(spark, sf_dir).collect()
        docs = [r.doc_id for r in rows]
        assert len(docs) == len(set(docs)), "a doc landed in two shards"
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            assert 0 <= r.shard < N_SHARDS
            by_shard.setdefault(r.shard, []).append(r.shard_pos)
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), (
                f"shard {shard} positions are not a contiguous 1..n"
            )

    def test_deterministic_across_runs(self, spark, sf_dir):
        a = [tuple(r) for r in sample_shuffle_shards(spark, sf_dir).collect()]
        b = [tuple(r) for r in sample_shuffle_shards(spark, sf_dir).collect()]
        assert a == b

    def test_order_breaks_doc_id_locality(self, spark, sf_dir):
        """Within a shard, consecutive positions must not be consecutive
        doc_ids (the whole point is decorrelating training order from
        ingest order): adjacent-id pairs should be rare."""
        rows = sample_shuffle_shards(spark, sf_dir).collect()
        by_shard: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append((r.shard_pos, r.doc_id))
        adjacent = total = 0
        for poss in by_shard.values():
            poss.sort()
            ids = [d for _, d in poss]
            adjacent += sum(1 for x, y in zip(ids, ids[1:]) if abs(x - y) == 1)
            total += max(len(ids) - 1, 0)
        assert total > 0
        assert adjacent / total < 0.05


class TestBm25Batch:
    def test_per_query_topk_laws(self, spark, sf_dir):
        from kafka_clickhouse_example_spark.plans.queries_text import (
            BM25_BATCH,
            BM25_BATCH_K,
            text_bm25_batch_topk,
        )

        rows = text_bm25_batch_topk(spark, sf_dir).collect()
        by_qid: dict[int, list] = {}
        for r in rows:
            by_qid.setdefault(r.qid, []).append(r)
        assert set(by_qid) <= set(BM25_BATCH)
        for qid, rs in by_qid.items():
            assert len(rs) <= BM25_BATCH_K
            assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == list(
                range(1, len(rs) + 1)
            )
            scores = [r.score for r in sorted(rs, key=lambda r: r.rnk)]
            assert scores == sorted(scores, reverse=True)
            for r in rs:
                assert 1 <= r.n_terms <= len(BM25_BATCH[qid])

    def test_single_query_slice_matches_single_bm25(self, spark, sf_dir):
        """Running a query through the batch path must rank exactly like the
        single-query operator when the term sets coincide."""
        from kafka_clickhouse_example_spark.plans import queries_text as QT

        old = QT.BM25_BATCH
        try:
            QT.BM25_BATCH = {9: list(QT.BM25_TERMS)}
            batch = [
                (r.doc_id, r.n_terms, r.score)
                for r in QT.text_bm25_batch_topk(spark, sf_dir).collect()
            ]
        finally:
            QT.BM25_BATCH = old
        single = [
            (r.doc_id, r.n_terms, r.score)
            for r in QT.text_bm25_topk(spark, sf_dir).collect()
        ]
        k = min(len(batch), len(single))
        assert batch[:k] == single[:k]


class TestLengthBucketedBatches:
    def test_padding_accounting_and_batch_laws(self, spark, sf_dir):
        from kafka_clickhouse_example_spark.plans.queries_sampling import (
            BATCH_SIZE,
            LEN_BUCKET_WIDTH,
            sample_length_bucketed_batches,
        )

        rows = sample_length_bucketed_batches(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r.n_seqs <= BATCH_SIZE
            assert r.padding_tok == r.max_tok * r.n_seqs - r.sum_tok
            assert 0 <= r.padding_frac < 1
            # within a width-W bucket, per-seq padding is < W, so the
            # fraction is bounded by W / max_tok — the whole point of
            # bucketing by length
            assert r.padding_tok <= (LEN_BUCKET_WIDTH - 1) * r.n_seqs
        # only the last batch of a bucket may be ragged (< BATCH_SIZE)
        by_bucket: dict[int, list] = {}
        for r in rows:
            by_bucket.setdefault(r.bucket, []).append(r)
        for rs in by_bucket.values():
            rs.sort(key=lambda r: r.batch_no)
            assert [r.batch_no for r in rs] == list(range(len(rs)))
            assert all(r.n_seqs == BATCH_SIZE for r in rs[:-1])


class TestBootstrapCi:
    def test_ci_brackets_the_true_mean(self, spark, sf_dir):
        from kafka_clickhouse_example_spark.plans.queries_analytics import (
            BOOT_B,
            orders_revenue_bootstrap_ci,
        )
        from kafka_clickhouse_example_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        row = orders_revenue_bootstrap_ci(spark, sf_dir).collect()[0]
        assert row.n_replicates == BOOT_B
        assert row.ci_lo < row.ci_med < row.ci_hi
        true_mean = (
            load_table(spark, sf_dir, "orders")
            .agg(F.avg("o_totalprice"))
            .collect()[0][0]
        )
        # a 95% CI from 64 replicates should bracket the point estimate
        assert row.ci_lo <= true_mean <= row.ci_hi


def test_group_split_never_straddles_a_source(spark, sf_dir):
    """Every document of a source must land in the same split — the
    structural guarantee that near-dups within a source cannot leak
    across train/test."""
    from kafka_clickhouse_example_spark.operators.sampling import with_split
    from kafka_clickhouse_example_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    per_source = (
        with_split(docs, "source")
        .groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_source and all(r.n_splits == 1 for r in per_source)


def test_proportional_samplers_survive_extreme_ratios(spark):
    """A stratum 200x the smallest must be DOWNSAMPLED, not dropped; and a
    200x outlier weight must not zero out the rest of the corpus — the
    100-bucket resolution bug (review finding)."""
    from kafka_clickhouse_example_spark.operators.sampling import (
        balanced_sample,
        weighted_bernoulli_sample,
    )

    rows = [(i, "big") for i in range(2000)] + [(90000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = balanced_sample(df, "lang", "doc_id").groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in kept}
    assert by_lang.get("big", 0) > 0, "large stratum vanished"
    assert by_lang["big"] <= 40  # ~10 expected, generous bound

    wrows = [(i, 10) for i in range(2000)] + [(90001, 2000)]
    wdf = spark.createDataFrame(wrows, "doc_id long, w long")
    n = weighted_bernoulli_sample(wdf, "w", "doc_id").count()
    # expected ~ 2000 * 10/2000 = 10 light rows + the heavy row
    assert n > 0, "light rows deterministically unsampleable"
