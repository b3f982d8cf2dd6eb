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
    for suffix in ("", "_terms", "_stats", "_docs", "_deletes"):
        spark.sql(f"DROP TABLE IF EXISTS term_idx{suffix}")


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
        for suffix in ("", "_terms", "_stats", "_docs", "_deletes"):
            spark.sql(f"DROP TABLE IF EXISTS term_idx2{suffix}")
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


def test_incremental_update_matches_fresh_rebuild(spark, sf_dir):
    """Round-5 verdict ask #7: merging a corpus delta into the index
    (O(delta) tokenize + bucket-appended postings + vocab-sized df merge +
    exact BIGINT stats roll-forward) must yield an index ROW-IDENTICAL to
    build_term_index over the concatenated corpus — postings, _terms and
    _stats all compared as row sets, and a served query must agree."""
    import tempfile

    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators.retrieval import (
        update_term_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    cut = docs.agg(F.expr("percentile(doc_id, 0.8)").alias("c")).first().c
    base = docs.filter(F.col("doc_id") <= cut)
    delta = docs.filter(F.col("doc_id") > cut)
    assert base.count() > 0 and delta.count() > 0
    assert base.count() + delta.count() == n

    def snapshot(tbl):
        return {
            "postings": sorted(tuple(r) for r in spark.table(tbl).collect()),
            "terms": sorted(tuple(r) for r in spark.table(tbl + "_terms").collect()),
            "stats": sorted(tuple(r) for r in spark.table(tbl + "_stats").collect()),
            "docs": sorted(tuple(r) for r in spark.table(tbl + "_docs").collect()),
        }

    with tempfile.TemporaryDirectory() as d:
        try:
            build_term_index(base, "inc_idx", buckets=16, path=d + "/inc")
            update_term_index(delta, "inc_idx", buckets=16)
            build_term_index(docs, "full_idx", buckets=16, path=d + "/full")
            merged, fresh = snapshot("inc_idx"), snapshot("full_idx")
            assert merged["stats"] == fresh["stats"]
            assert merged["terms"] == fresh["terms"]
            assert merged["postings"] == fresh["postings"]
            assert merged["docs"] == fresh["docs"]
            served_m = bm25_topk_from_index(spark, "inc_idx", ["spark", "merge"]).collect()
            served_f = bm25_topk_from_index(spark, "full_idx", ["spark", "merge"]).collect()
            assert served_m == served_f and len(served_m) > 0
            # bucket pruning survives the append (more files per bucket,
            # same bucket count)
            plan = (
                bm25_topk_from_index(spark, "inc_idx", ["spark"])
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
            assert m and int(m.group(2)) == 16 and int(m.group(1)) <= 1
        finally:
            for t in ("inc_idx", "full_idx"):
                for suffix in ("", "_terms", "_stats", "_docs", "_deletes"):
                    spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")


def test_incremental_update_keeps_external_side_tables(spark, sf_dir):
    """A path-built index publishes its side tables at <path>_terms /
    <path>_stats; the merge's overwrite recreates those tables and must
    keep them EXTERNAL at the same location — without re-supplying the
    path they silently migrate into the warehouse and the published
    parquet goes stale for path-based consumers (review finding)."""
    import tempfile

    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators.retrieval import (
        update_term_index,
    )

    docs = load_table(spark, sf_dir, "documents").limit(40)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as d:
        try:
            build_term_index(base, "ext_idx", buckets=4, path=d + "/ext")
            update_term_index(delta, "ext_idx", buckets=4)
            for suffix in ("_terms", "_stats"):
                table_rows = sorted(
                    tuple(r) for r in spark.table("ext_idx" + suffix).collect()
                )
                path_rows = sorted(
                    tuple(r)
                    for r in spark.read.parquet(d + "/ext" + suffix).collect()
                )
                assert table_rows == path_rows, suffix
                info = {
                    r.col_name: r.data_type
                    for r in spark.sql(
                        f"DESCRIBE TABLE EXTENDED ext_idx{suffix}"
                    ).collect()
                }
                assert info["Type"].upper() == "EXTERNAL", suffix
            # the merged stats at the published path reflect the delta
            srow = spark.read.parquet(d + "/ext_stats").first()
            assert srow.n_docs == base.count() + delta.count()
        finally:
            for suffix in ("", "_terms", "_stats", "_docs", "_deletes"):
                spark.sql(f"DROP TABLE IF EXISTS ext_idx{suffix}")


def test_incremental_update_rejects_existing_ids(spark, sf_dir):
    """Append-only contract: a delta re-using an indexed doc_id must raise
    (updates are delete + re-add, the SCD2 rule), not silently double-count."""
    import tempfile

    import pytest as _pytest

    from kafka_clickhouse_example_spark.operators.retrieval import (
        update_term_index,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    with tempfile.TemporaryDirectory() as d:
        try:
            build_term_index(docs, "dup_idx", buckets=4, path=d + "/dup")
            with _pytest.raises(ValueError, match="append-only"):
                update_term_index(docs.limit(5), "dup_idx", buckets=4)
        finally:
            for suffix in ("", "_terms", "_stats", "_docs", "_deletes"):
                spark.sql(f"DROP TABLE IF EXISTS dup_idx{suffix}")


def test_incremental_update_rejects_null_text_readd(spark, sf_dir):
    """The guard must catch re-adds of NULL-text documents too: they have
    ZERO postings rows (tokens of NULL explode to nothing), so a
    postings-based id check can't see them — the <table>_docs relation,
    written from the docs frame, can. Without this, re-adding a NULL-text
    doc silently double-counts n_docs and skews every BM25 idf."""
    import tempfile

    import pytest as _pytest

    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators.retrieval import (
        update_term_index,
    )

    docs = load_table(spark, sf_dir, "documents").limit(10)
    nulled = docs.withColumn(
        "text", F.when(F.col("doc_id") == docs.first().doc_id, None).otherwise(F.col("text"))
    )
    null_doc = nulled.filter(F.col("text").isNull())
    assert null_doc.count() == 1
    with tempfile.TemporaryDirectory() as d:
        try:
            build_term_index(nulled, "nulldoc_idx", buckets=4, path=d + "/nd")
            # the NULL-text doc is in _docs despite having no postings
            assert (
                spark.table("nulldoc_idx_docs")
                .join(null_doc.select("doc_id"), "doc_id", "left_semi")
                .count()
                == 1
            )
            with _pytest.raises(ValueError, match="append-only"):
                update_term_index(null_doc, "nulldoc_idx", buckets=4)
        finally:
            for suffix in ("", "_terms", "_stats", "_docs", "_deletes"):
                spark.sql(f"DROP TABLE IF EXISTS nulldoc_idx{suffix}")


def test_delete_masks_serving_and_compact_matches_rebuild(spark, sf_dir):
    """The delete half of the index's "delete + re-add" contract: a
    tombstoned doc (including a NULL-text one, which has no postings
    rows) vanishes from served results immediately with stats left stale
    (Lucene deleted-docs semantics); compact_term_index then rewrites the
    index ROW-IDENTICAL to a fresh build over the surviving corpus;
    re-adding is refused while the tombstone is pending and round-trips
    after compaction."""
    import tempfile

    import pytest as _pytest

    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators.retrieval import (
        compact_term_index,
        delete_docs_from_term_index,
        update_term_index,
    )

    docs = load_table(spark, sf_dir, "documents").limit(60)
    null_id = docs.first().doc_id
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == null_id, None).otherwise(F.col("text")),
    )
    with tempfile.TemporaryDirectory() as d:
        try:
            build_term_index(docs, "delt_idx", buckets=4, path=d + "/delt")
            served0 = bm25_topk_from_index(
                spark, "delt_idx", ["spark", "merge"]
            ).collect()
            assert served0
            victim = served0[0].doc_id  # a doc currently being served
            victims = docs.filter(F.col("doc_id").isin([victim, null_id]))

            delete_docs_from_term_index(victims.select("doc_id"), "delt_idx")
            served1 = bm25_topk_from_index(
                spark, "delt_idx", ["spark", "merge"]
            ).collect()
            assert all(r.doc_id != victim for r in served1)
            with _pytest.raises(ValueError, match="tombstone"):
                update_term_index(victims, "delt_idx", buckets=4)

            # bucket count is read from the catalog (a caller-remembered
            # count could silently re-bucket the 4-bucket layout)
            compact_term_index(spark, "delt_idx")
            rest = docs.join(victims.select("doc_id"), "doc_id", "left_anti")
            build_term_index(rest, "delt_ref", buckets=4, path=d + "/ref")
            plan = (
                bm25_topk_from_index(spark, "delt_idx", ["spark"])
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
            assert m and int(m.group(2)) == 4, "compaction re-bucketed the layout"

            def snap(t):
                return {
                    s: sorted(tuple(r) for r in spark.table(t + s).collect())
                    for s in ("", "_terms", "_stats", "_docs", "_deletes")
                }

            assert snap("delt_idx") == snap("delt_ref")
            # the NULL-text victim counted in n_docs and is gone from it
            assert (
                spark.table("delt_idx_stats").first().n_docs
                == docs.count() - 2
            )
            # delete + compact + re-add round-trips
            update_term_index(victims, "delt_idx", buckets=4)
            assert (
                spark.table("delt_idx_docs")
                .filter(F.col("doc_id").isin([victim, null_id]))
                .count()
                == 2
            )
        finally:
            for t in ("delt_idx", "delt_ref"):
                for suffix in ("", "_terms", "_stats", "_docs", "_deletes"):
                    spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")


@pytest.mark.slow
def test_term_index_random_lifecycle_matches_rebuild(spark, tmp_path_factory):
    """Property test over the index's whole delete + re-add lifecycle:
    under ANY interleaving of delta merges, tombstone deletes (including
    NULL-text docs and unknown ids), refused pending re-adds, and
    compactions, the served doc set always equals the model's live set,
    and every compaction leaves the index ROW-IDENTICAL to a fresh
    build over the surviving corpus. The hand-written test above pins
    one sequence; this pins their composition."""
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from kafka_clickhouse_example_spark.operators.retrieval import (
        compact_term_index,
        delete_docs_from_term_index,
        update_term_index,
    )

    WORDS = ["spark", "merge", "scan", "join", "plan"]
    counter = {"n": 0}

    def docs_df(items):  # [(id, text|None)]
        return spark.createDataFrame(items, "doc_id long, text string")

    def snap(t):
        return {
            s: sorted(tuple(r) for r in spark.table(t + s).collect())
            for s in ("", "_terms", "_stats", "_docs")
        }

    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def run(data):
        counter["n"] += 1
        t = f"ti_prop_{counter['n']}"
        ref = t + "_ref"
        next_id = {"v": 0}

        def fresh_docs(n):
            out = []
            for _ in range(n):
                i = next_id["v"]
                next_id["v"] += 1
                text = data.draw(
                    st.one_of(
                        st.none(),  # NULL-text docs count in n_docs
                        st.lists(
                            st.sampled_from(WORDS), min_size=1, max_size=4
                        ).map(" ".join),
                    ),
                    label="text",
                )
                out.append((i, text))
            return out

        with tempfile.TemporaryDirectory() as d:
            try:
                live = dict(fresh_docs(data.draw(st.integers(3, 6), label="n0")))
                build_term_index(
                    docs_df(list(live.items())), t, buckets=2, path=d + "/i"
                )
                pending: set[int] = set()
                for _ in range(data.draw(st.integers(3, 6), label="n_ops")):
                    op = data.draw(
                        st.sampled_from(
                            ["add", "delete", "readd_pending", "compact"]
                        ),
                        label="op",
                    )
                    if op == "add":
                        delta = fresh_docs(data.draw(st.integers(1, 3), label="k"))
                        update_term_index(docs_df(delta), t, buckets=2)
                        live.update(delta)
                    elif op == "delete" and live:
                        ids = data.draw(
                            st.lists(
                                st.sampled_from(sorted(live)),
                                min_size=1,
                                max_size=2,
                                unique=True,
                            ),
                            label="del_ids",
                        )
                        unknown = data.draw(st.booleans(), label="unknown")
                        rows = [(i,) for i in ids] + (
                            [(10**6,)] if unknown else []  # never indexed
                        )
                        delete_docs_from_term_index(
                            spark.createDataFrame(rows, "doc_id long"), t
                        )
                        for i in ids:
                            del live[i]
                        pending |= set(ids)  # unknown id is NOT tombstoned
                    elif op == "readd_pending" and pending:
                        victim = sorted(pending)[0]
                        with pytest.raises(ValueError, match="tombstone"):
                            update_term_index(
                                docs_df([(victim, "spark")]), t, buckets=2
                            )
                    elif op == "compact":
                        compact_term_index(spark, t)
                        pending.clear()
                        build_term_index(
                            docs_df(list(live.items())),
                            ref,
                            buckets=2,
                            path=d + f"/r{counter['n']}_{next_id['v']}",
                        )
                        assert snap(t) == snap(ref)
                        assert spark.table(t + "_deletes").isEmpty()
                    # served postings and docs relation == the live set
                    served_ids = {
                        r.doc_id
                        for r in spark.table(t + "_docs")
                        .join(
                            F.broadcast(spark.table(t + "_deletes")),
                            "doc_id",
                            "left_anti",
                        )
                        .collect()
                    }
                    assert served_ids == set(live)
                    topk = bm25_topk_from_index(spark, t, [WORDS[0]]).collect()
                    assert {r.doc_id for r in topk} <= set(live)
            finally:
                for tbl in (t, ref):
                    for s in ("", "_terms", "_stats", "_docs", "_deletes"):
                        spark.sql(f"DROP TABLE IF EXISTS {tbl}{s}")

    run()
