"""Prebuilt inverted index: bucket-pruned query scans + exact score parity
with the live-path BM25."""

from __future__ import annotations

import re

import pytest

from kafka_clickhouse_example_spark.operators.retrieval import (
    bm25_topk_from_index,
    build_term_index,
)
from kafka_clickhouse_example_spark.plans.queries_text import (
    BM25_TERMS,
    BM25_TOP_K,
    text_bm25_topk,
)
from kafka_clickhouse_example_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def term_index(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("term_index")
    docs = load_table(spark, sf_dir, "documents")
    build_term_index(docs, "term_idx", buckets=16, path=str(base / "idx"))
    yield "term_idx"
    spark.sql("DROP TABLE IF EXISTS term_idx")
    spark.sql("DROP TABLE IF EXISTS term_idx_terms")
    spark.sql("DROP TABLE IF EXISTS term_idx_stats")


def test_query_scan_is_bucket_pruned(spark, term_index):
    """`term IN (...)` over the bucketed index must open only the buckets
    the query terms hash into — posting-list lookup behavior on parquet."""
    df = bm25_topk_from_index(spark, term_index, list(BM25_TERMS), k=BM25_TOP_K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning in plan:\n{plan}"
    selected, total = int(m.group(1)), int(m.group(2))
    assert total == 16
    assert selected <= len(BM25_TERMS), (
        f"opened {selected} buckets for {len(BM25_TERMS)} terms"
    )


def test_index_scores_match_live_path(spark, sf_dir, term_index):
    """The index path and the live tokenize-per-query path must return the
    identical ranked result — same rational-idf Q30 formula, same data."""
    live = [tuple(r) for r in text_bm25_topk(spark, sf_dir).collect()]
    indexed = [
        tuple(r)
        for r in bm25_topk_from_index(
            spark, term_index, list(BM25_TERMS), k=BM25_TOP_K
        ).collect()
    ]
    assert indexed == live


def test_index_rebuild_is_idempotent(spark, sf_dir, term_index):
    """Rebuilding over the same corpus must not change any answer (overwrite
    mode; build is deterministic)."""
    before = bm25_topk_from_index(spark, term_index, ["spark", "merge"]).collect()
    docs = load_table(spark, sf_dir, "documents")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        build_term_index(docs, "term_idx2", buckets=16, path=d + "/idx")
        again = bm25_topk_from_index(spark, "term_idx2", ["spark", "merge"]).collect()
        spark.sql("DROP TABLE IF EXISTS term_idx2")
        spark.sql("DROP TABLE IF EXISTS term_idx2_terms")
        spark.sql("DROP TABLE IF EXISTS term_idx2_stats")
    assert again == before


def test_query_path_has_no_postings_aggregation(spark, term_index):
    """df/stats are prebuilt: the query plan must contain exactly ONE
    aggregate pair (the per-doc BM25_Q fixed-point sum), not a df-recomputation over the
    postings."""
    df = bm25_topk_from_index(spark, term_index, list(BM25_TERMS), k=BM25_TOP_K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial+final of the single groupBy(doc_id) => exactly 2 HashAggregate
    assert plan.count("HashAggregate") == 2, plan


def test_batch_index_matches_live_batch(spark, sf_dir, term_index):
    """The build-index -> serve-queries batch surface: serving the whole
    BM25_BATCH workload from the prebuilt index must return row-for-row
    the live tokenize-per-batch result (same bm25_q tree, same data)."""
    from kafka_clickhouse_example_spark.plans.queries_text import (
        text_bm25_batch_topk,
    )

    live = [tuple(r) for r in text_bm25_batch_topk(spark, sf_dir).collect()]
    indexed = [
        tuple(r)
        for r in text_bm25_batch_topk(spark, sf_dir, index_table=term_index).collect()
    ]
    assert indexed == live


def test_batch_index_scan_is_bucket_pruned(spark, term_index):
    """The batch path must keep posting-list lookup behavior: one pruned
    scan for the union of all batch terms, no full-index read."""
    from kafka_clickhouse_example_spark.operators.retrieval import (
        bm25_batch_topk_from_index,
    )
    from kafka_clickhouse_example_spark.plans.queries_text import (
        BM25_BATCH,
        BM25_BATCH_K,
    )

    df = bm25_batch_topk_from_index(spark, term_index, BM25_BATCH, BM25_BATCH_K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning in plan:\n{plan}"
    n_union = len({t for ts in BM25_BATCH.values() for t in ts})
    assert int(m.group(1)) <= n_union
