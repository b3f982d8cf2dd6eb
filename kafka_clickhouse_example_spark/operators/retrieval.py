"""Prebuilt inverted index for keyword retrieval: build posting lists ONCE,
bucketed by term, then answer BM25 queries from the index with bucket-pruned
scans — no per-query corpus tokenization.

The live-path BM25 (plans/queries_text.text_bm25_topk) tokenizes the corpus
per query: correct, but at 100 TB the tokenize+explode dominates and is paid
on EVERY query. A retrieval system amortizes it: the index build pays one
corpus pass + one shuffle (the same groupBy the live path does), and each
query then reads ONLY the buckets its terms hash into — Spark's bucket
pruning turns `term IN (...)` into "open |terms|-ish of N buckets"
(`SelectedBucketsCount` in the scan node), which is posting-list lookup
behavior on plain parquet, no serving infra. Per-term document frequency and
the corpus stats (n_docs, avgdl) are materialized at build time (derived
from the postings themselves — no second corpus pass), so the query path is
a pruned scan + two broadcasts and nothing corpus-sized.

This module also owns the ONE definition of the BM25 scoring expression
(:func:`bm25_score`): the live single-query, batch, and index paths all
build their Q20 ranking key from it, so the k1/b constants and the
rational-idf form cannot drift apart (review finding — the expression was
previously copied in three places with only one pair test-pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.text import tokens
from kafka_clickhouse_example_spark.operators.tombstones import (
    append_tombstones,
    mask_deleted,
    raise_if_pending_tombstone,
    reset_tombstones,
)
from kafka_clickhouse_example_spark.sources.catalog import (
    bucket_count,
    external_location as _external_location,
)

BM25_K1 = 1.2
BM25_B = 0.75
# Fixed-point scale for the exact BIGINT ranking key. Q20, not Q30: the
# rational idf grows ~linearly with corpus size (that is the log-free
# trade), so floor(score * scale) must stay under 2^63 at the target
# scale — at Q20 the key overflows only past ~5.9e12 documents, 30x
# headroom over the 2e11-doc 100 TB framing (Q30 hit the cliff at ~6e9
# docs — review finding).
BM25_Q = 1 << 20


def bm25_score(
    tf: Column,
    dl: Column,
    df: Column,
    n_docs: Column,
    avgdl: Column,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    """Per-(doc, term) BM25 contribution — log-free rational idf
    ((N-df+0.5)/(df+0.5), monotone-equivalent to the Lucene log form and
    bit-exact across engines) times the saturated tf term. All inputs are
    Columns so every caller shares the exact operation order (IEEE
    mul/div are deterministic only if the expression tree is identical).
    """
    idf = ((n_docs - df).cast("double") + 0.5) / (df.cast("double") + 0.5)
    denom = tf.cast("double") + k1 * (1.0 - b + (b * dl.cast("double")) / avgdl)
    return idf * (tf.cast("double") * (k1 + 1.0)) / denom


def bm25_q(tf, dl, df, n_docs, avgdl, k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """The exact BIGINT ranking key: floor(score * 2^20) — summable in any
    order, comparable across engines, overflow-free to ~5.9e12 docs."""
    return F.floor(bm25_score(tf, dl, df, n_docs, avgdl, k1, b) * BM25_Q).cast("bigint")


def build_term_index(
    docs: DataFrame,
    table: str,
    *,
    buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    path: str | None = None,
) -> None:
    """Materialize the inverted index: (term, doc_id, tf, dl) posting rows
    bucketed AND sorted by term, ``<table>_terms`` (term, df — the
    vocabulary-sized document frequencies), ``<table>_stats`` (n_docs,
    avgdl, sum_dl), and ``<table>_docs`` (the indexed doc_id set —
    update_term_index's O(n_docs) append-only guard).

    ONE corpus tokenize pass: df and the document lengths derive from the
    written postings (per-doc max(dl) recovers them exactly). n_docs comes
    from a tokenize-free count over the docs frame, NOT the postings:
    NULL-text documents contribute no postings but DO count in the live
    path's corpus size, and deriving n_docs from postings alone silently
    de-synced every score on such corpora (review finding). avgdl uses
    the same convention as the live path: token sum over tokenizable docs
    divided by ALL docs.
    """
    a = tokens(F.col(text_col))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(a).cast("bigint").alias("dl"),
        F.explode(a).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.max("dl").alias("dl"), F.count("*").alias("tf")
    )
    w = (
        postings.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, "term")
        .sortBy("term")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)

    spark = docs.sparkSession
    written = spark.table(table)
    dfreq = written.groupBy("term").agg(F.count("*").alias("df"))
    dw = dfreq.write.format("parquet").mode("overwrite")
    if path is not None:
        dw = dw.option("path", path + "_terms")
    dw.saveAsTable(table + "_terms")

    n_docs = docs.count()  # cheap metadata-ish scan; no tokenize
    per_doc = written.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    # sum_dl is stored as exact BIGINT (not just the derived avgdl) so an
    # incremental delta merge can recompute avgdl with the IDENTICAL
    # double division a fresh rebuild performs — avgdl_old * n_old would
    # reintroduce float rounding and break rebuild parity.
    stats = per_doc.agg(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.lit(float(n_docs))).alias("avgdl"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("sum_dl"),
    )
    sw = stats.write.format("parquet").mode("overwrite")
    if path is not None:
        sw = sw.option("path", path + "_stats")
    sw.saveAsTable(table + "_stats")

    # <table>_docs: one row per indexed doc_id, FROM THE DOCS FRAME, not
    # the postings — NULL-text documents produce zero postings but are
    # part of the corpus (they count in n_docs), so a postings-derived id
    # set would let update_term_index re-add them and silently
    # double-count n_docs. Also the O(n_docs) relation the append-only
    # guard scans instead of the O(postings) table (~1000x smaller at
    # 100 TB: one id per doc vs one row per doc-term).
    docw = docs.select(F.col(id_col).alias("doc_id")).write.format(
        "parquet"
    ).mode("overwrite")
    if path is not None:
        docw = docw.option("path", path + "_docs")
    docw.saveAsTable(table + "_docs")

    # <table>_deletes: the (initially empty) tombstone doc_id set.
    # delete_docs_from_term_index appends O(delta); serving anti-joins it
    # (deleted docs vanish from results immediately); compact_term_index
    # physically rewrites and resets it.
    delw = (
        docs.select(F.col(id_col).alias("doc_id"))
        .limit(0)
        .write.format("parquet")
        .mode("overwrite")
    )
    if path is not None:
        delw = delw.option("path", path + "_deletes")
    delw.saveAsTable(table + "_deletes")


def update_term_index(
    delta_docs: DataFrame,
    table: str,
    *,
    buckets: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    check_new_ids: bool = True,
) -> None:
    """Merge a delta corpus (NEW documents only) into an existing index
    WITHOUT re-tokenizing or re-shuffling the historical corpus — the
    asymmetric incremental shape incremental_minhash_pairs uses
    (operators/dedup.py): all O(corpus) work happened at build time, the
    daily delta pays only O(delta).

    - postings: the delta's (term, doc_id, tf, dl) rows APPEND as new
      files into the same bucket layout (bucket pruning still prunes —
      each bucket just has more files), so the merge writes O(delta)
      bytes, never rewrites history;
    - ``<table>_terms``: vocabulary-sized df merge (old + delta counts);
    - ``<table>_stats``: exact BIGINT accumulators (n_docs, sum_dl) roll
      forward and avgdl is re-derived with the same division a fresh
      rebuild performs, so the merged index is ROW-IDENTICAL to
      build_term_index over the concatenated corpus
      (tests/test_retrieval_index.py pins it).

    ``check_new_ids`` guards the append-only contract (a changed document
    must be handled as delete + re-add, same as the SCD2 rule): it costs a
    broadcast semi-join of the delta ids against ``<table>_docs`` — the
    O(n_docs) id relation, not the O(postings) table (~1000x less IO at
    corpus scale: one row per doc vs one per doc-term), and the only id
    set that also covers NULL-text documents, which have NO postings rows
    (a postings-based check would let a NULL-text re-add through and
    silently double-count n_docs). Map-only, no shuffle; can be disabled
    when ingest already guarantees fresh ids — ``_docs`` is rolled
    forward either way.
    """
    spark = delta_docs.sparkSession
    if check_new_ids:
        raise_if_pending_tombstone(
            delta_docs.select(F.col(id_col).alias("doc_id")),
            table + "_deletes",
            "doc_id",
            "update_term_index",
            "compact_term_index",
        )
    a = tokens(F.col(text_col))
    toks = delta_docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(a).cast("bigint").alias("dl"),
        F.explode(a).alias("term"),
    )
    # Materialize once: the delta postings feed three consumers (bucket
    # append, df merge, stats roll-forward) — without the checkpoint the
    # delta would re-tokenize per consumer.
    delta_postings = (
        toks.groupBy("term", "doc_id")
        .agg(F.max("dl").alias("dl"), F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )

    delta_ids = delta_docs.select(F.col(id_col).alias("doc_id"))
    if check_new_ids:
        clash = (
            spark.table(table + "_docs")
            .join(F.broadcast(delta_ids.distinct()), "doc_id", "left_semi")
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"update_term_index: delta contains doc_id {clash[0].doc_id} "
                "already present in the index — the merge is append-only; "
                "handle updates as delete + re-add"
            )

    (
        delta_postings.write.format("parquet")
        .mode("append")
        .bucketBy(buckets, "term")
        .sortBy("term")
        .saveAsTable(table)
    )

    # Vocabulary-sized df merge. localCheckpoint BEFORE overwrite: the
    # merged frame reads the table it replaces (self-referential overwrite
    # rule — see .claude/skills/verify gotchas / sinks/merge.py).
    delta_df = delta_postings.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    merged_df = (
        spark.table(table + "_terms")
        .unionByName(delta_df)
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"))
        .localCheckpoint(eager=True)
    )
    # Overwrites recreate the table: keep a path-built side table at its
    # published location (external stays external, see _external_location).
    tw = merged_df.write.format("parquet").mode("overwrite")
    terms_loc = _external_location(spark, table + "_terms")
    if terms_loc is not None:
        tw = tw.option("path", terms_loc)
    tw.saveAsTable(table + "_terms")

    n_delta = delta_docs.count()
    delta_sum = delta_postings.groupBy("doc_id").agg(F.max("dl").alias("dl")).agg(
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("delta_sum_dl")
    )
    new_stats = (
        spark.table(table + "_stats")
        .crossJoin(F.broadcast(delta_sum))  # two 1-row frames
        .select(
            (F.col("n_docs") + F.lit(n_delta)).cast("bigint").alias("n_docs"),
            (F.col("sum_dl") + F.col("delta_sum_dl")).cast("bigint").alias("sum_dl"),
        )
        .localCheckpoint(eager=True)
    )
    row = new_stats.first()  # 1-row frame: bounded driver read
    final_stats = new_stats.select(
        "n_docs",
        # identical op order to build_term_index: sum_dl double / float(n)
        (F.col("sum_dl").cast("double") / F.lit(float(row.n_docs))).alias("avgdl"),
        "sum_dl",
    )
    sw = final_stats.write.format("parquet").mode("overwrite")
    stats_loc = _external_location(spark, table + "_stats")
    if stats_loc is not None:
        sw = sw.option("path", stats_loc)
    sw.saveAsTable(table + "_stats")

    # Roll the id relation forward (append-only, O(delta) rows) so the
    # NEXT merge's guard sees these docs — including NULL-text ones.
    delta_ids.write.format("parquet").mode("append").saveAsTable(table + "_docs")


def _without_deleted_docs(df: DataFrame, table: str) -> DataFrame:
    """Serving-time tombstone mask (tombstones.mask_deleted): deleted docs
    vanish from results immediately, while the corpus statistics (df,
    n_docs, avgdl) stay those of the uncompacted index until
    :func:`compact_term_index` runs — exactly Lucene's deleted-docs
    semantics (scores go slightly stale, results never contain a deleted
    doc)."""
    return mask_deleted(df, table + "_deletes", "doc_id")


def delete_docs_from_term_index(
    ids: DataFrame, table: str, *, id_col: str = "doc_id"
) -> None:
    """Tombstone deletion — the missing half of the index's documented
    "delete + re-add" update contract (tombstones.append_tombstones, the
    device shared with ann_index.delete_vectors_from_ann_index): O(delta)
    append of the distinct, actually-indexed ids into ``<table>_deletes``
    via one map-only broadcast semi-join over the O(n_docs) ``_docs``
    relation; no postings file is touched. Serving masks the doc
    immediately; physical removal (and the stats/df correction) happens
    at :func:`compact_term_index`."""
    append_tombstones(
        ids.select(F.col(id_col).alias("doc_id")),
        table + "_deletes",
        table + "_docs",
        "doc_id",
    )


def compact_term_index(spark: SparkSession, table: str) -> None:
    """Physically remove tombstoned documents and correct the statistics.

    Postings are BUCKETED by term (bucket pruning is the serving story),
    so unlike the cell-partitioned ANN layout there is no doc-keyed
    partition to prune: compaction is a full postings rewrite — the
    Lucene segment-merge cost shape, paid once per maintenance window and
    amortized over every delete since the last one. The rewritten index
    is ROW-IDENTICAL to build_term_index over the surviving corpus
    (test-pinned): postings anti-joined against the tombstones, df
    re-derived from the rewritten postings with build's exact groupBy,
    stats recomputed with build's identical division order (n_docs from
    the rolled-back ``_docs`` relation, which covers NULL-text docs that
    have no postings rows), and exactly the compacted tombstones removed
    (tombstones appended mid-compaction survive the reset). All
    overwrites keep path-built side tables external at their published
    location, and the bucket count is read from the catalog — trusting a
    caller-remembered count could silently re-bucket the layout.
    """
    if not spark.catalog.tableExists(table + "_deletes"):
        return
    dels = (
        spark.table(table + "_deletes").distinct().localCheckpoint(eager=True)
    )
    if dels.isEmpty():
        return
    buckets = bucket_count(spark, table)

    def _overwrite(df: DataFrame, tbl: str, bucketed: bool = False) -> None:
        w = df.write.format("parquet").mode("overwrite")
        if bucketed:
            w = w.bucketBy(buckets, "term").sortBy("term")
        loc = _external_location(spark, tbl)
        if loc is not None:
            w = w.option("path", loc)
        w.saveAsTable(tbl)

    cols = spark.table(table).columns
    keep_postings = (
        spark.table(table)
        .join(F.broadcast(dels), "doc_id", "left_anti")
        .select(*cols)  # the join fronts doc_id; keep build's column order
        .localCheckpoint(eager=True)  # self-referential overwrite rule
    )
    _overwrite(keep_postings, table, bucketed=True)

    written = spark.table(table)
    dfreq = written.groupBy("term").agg(F.count("*").alias("df"))
    _overwrite(dfreq.localCheckpoint(eager=True), table + "_terms")

    keep_docs = (
        spark.table(table + "_docs")
        .join(F.broadcast(dels), "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    n_docs = keep_docs.count()
    per_doc = written.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    stats = per_doc.agg(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.lit(float(n_docs))).alias("avgdl"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("sum_dl"),
    )
    _overwrite(stats.localCheckpoint(eager=True), table + "_stats")
    _overwrite(keep_docs, table + "_docs")

    reset_tombstones(spark, table + "_deletes", dels, "doc_id")


def bm25_topk_from_index(
    spark: SparkSession,
    table: str,
    terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Answer a BM25 top-k query from the prebuilt index: bucket-pruned
    postings scan + broadcast of the PREBUILT df/stats tables + Q20-exact
    TakeOrdered. Identical scoring to the live path (same
    :func:`bm25_score` tree); zero corpus-sized work per query — no
    aggregation over the postings at all (review finding: df used to be
    recomputed per query even though it is a build-time property).
    Tombstoned docs are masked (:func:`_without_deleted_docs`).
    """
    idx = _without_deleted_docs(
        spark.table(table).filter(F.col("term").isin(terms)), table
    )
    dfreq = spark.table(table + "_terms").filter(F.col("term").isin(terms))
    stats = spark.table(table + "_stats")
    q = bm25_q(
        F.col("tf"), F.col("dl"), F.col("df"), F.col("n_docs"), F.col("avgdl"), k1, b
    )
    return (
        idx.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", q.alias("q"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"), F.sum("q").alias("q_sum"))
        .orderBy(F.col("q_sum").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "n_terms",
            F.round(F.col("q_sum").cast("double") / BM25_Q, 6).alias("score"),
        )
    )


def bm25_batch_topk_from_index(
    spark: SparkSession,
    table: str,
    batch: dict[int, list[str]],
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Batch BM25 served from the prebuilt index: the build-index ->
    serve-queries story as one surface. Postings are bucket-pruned to the
    UNION of all query terms (one pruned scan shared by every query in the
    batch), the qid->term map / prebuilt df / prebuilt stats broadcast,
    and the per-query top-k cut is a window partitioned by qid — same
    downstream plan as the live plans/queries_text.text_bm25_batch_topk,
    minus the corpus tokenize. Row-for-row parity with the live path is
    pinned by tests/test_retrieval_index.py.
    """
    from pyspark.sql import Window

    union_terms = sorted({t for ts in batch.values() for t in ts})
    idx = _without_deleted_docs(
        spark.table(table).filter(F.col("term").isin(union_terms)), table
    )
    dfreq = spark.table(table + "_terms").filter(F.col("term").isin(union_terms))
    stats = spark.table(table + "_stats")
    queries = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(batch.items()) for t in ts],
        "qid long, term string",
    )
    q = bm25_q(
        F.col("tf"), F.col("dl"), F.col("df"), F.col("n_docs"), F.col("avgdl"), k1, b
    )
    per_doc = (
        idx.join(F.broadcast(queries), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("qid", "doc_id", q.alias("q"))
        .groupBy("qid", "doc_id")
        .agg(F.count("*").alias("n_terms"), F.sum("q").alias("q_sum"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("q_sum").desc(), "doc_id")
    return (
        per_doc.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            "rnk",
            "doc_id",
            "n_terms",
            F.round(F.col("q_sum").cast("double") / BM25_Q, 6).alias("score"),
        )
        .orderBy("qid", "rnk")
    )
