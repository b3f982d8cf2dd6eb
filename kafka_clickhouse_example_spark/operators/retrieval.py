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
behavior on plain parquet, no serving infra. Corpus stats (n_docs, avgdl)
are computed at build time into a 1-row sibling table, so queries touch
nothing corpus-sized.

Score parity with the live path is pinned by test (identical rational-idf
Q30 formula; tests/test_retrieval_index.py compares row-for-row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.text import tokens

# Mirrors plans/queries_text.py BM25_K1/BM25_B — parity is test-enforced.
BM25_K1 = 1.2
BM25_B = 0.75
_Q30 = 1 << 30


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
    bucketed AND sorted by term, plus ``<table>_stats`` (n_docs, avgdl).

    One corpus pass + one (doc, term) shuffle — the exact work the live
    BM25 pays per query, paid once. Bucketing by term means a later
    ``term IN (...)`` scan opens only the matching buckets.
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
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum(F.size(a)).cast("double") / F.count("*")).alias("avgdl"),
    )
    sw = stats.write.format("parquet").mode("overwrite")
    if path is not None:
        sw = sw.option("path", path + "_stats")
    sw.saveAsTable(table + "_stats")


def bm25_topk_from_index(
    spark: SparkSession,
    table: str,
    terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Answer a BM25 top-k query from the prebuilt index: bucket-pruned
    postings scan -> broadcast df/stats -> Q30-exact TakeOrdered. Identical
    scoring to the live path; corpus-sized work is zero (df for each term
    derives from the pruned postings themselves).
    """
    idx = spark.table(table).filter(F.col("term").isin(terms))
    dfreq = idx.groupBy("term").agg(F.count("*").alias("df"))
    stats = spark.table(table + "_stats")
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + 0.5) / (
        F.col("df").cast("double") + 0.5
    )
    denom = F.col("tf").cast("double") + k1 * (
        1.0 - b + (b * F.col("dl").cast("double")) / F.col("avgdl")
    )
    score = idf * (F.col("tf").cast("double") * (k1 + 1.0)) / denom
    return (
        idx.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.floor(score * _Q30).cast("bigint").alias("q30"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_terms"), F.sum("q30").alias("q30_sum"))
        .orderBy(F.col("q30_sum").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "n_terms",
            F.round(F.col("q30_sum").cast("double") / _Q30, 6).alias("score"),
        )
    )
