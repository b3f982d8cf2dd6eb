"""Streaming ingest dedup gate: the online composition of the asymmetric
MinHash pipeline — every arriving micro-batch of documents is near-dup
checked against the ACCUMULATED corpus before it lands, so the corpus store
only ever grows by novel documents.

Per batch (all map-side against the corpus, per operators/dedup.
incremental_minhash_pairs):

1. batch-internal dedup: exact + near-dup within the batch itself (a batch
   can contain its own duplicates);
2. batch-vs-corpus: an EXACT content-hash leg (batch hashes broadcast —
   catches byte-identical copies including docs too short to shingle)
   plus incremental near-dup LSH — batch band keys broadcast, corpus
   scanned in place, never self-joined;
3. survivors append to the corpus store; rejected docs append to a
   quarantine report (doc_id, matched corpus doc, jaccard) for audit.

Delivery: the append of survivors is at-least-once under crash-replay; a
REPLAYED batch's documents are all near-dup (jaccard 1.0) against their
own previously-landed copies, so the gate itself makes the replay a
content no-op — the same self-healing idempotency argument as the CDC
upsert sink, here emerging from the dedup semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import dedup as D


def gate_batch(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float,
) -> tuple[DataFrame, DataFrame]:
    """Pure (testable) core: returns (survivors, rejects_report) for one
    batch against the corpus (None = empty store)."""
    # 1. batch-internal: exact first (content hash), then near-dup pairs —
    # keep the min doc_id of every connected pair (cheap transitive
    # approximation for a batch-sized set: reject anything that appears as
    # the larger id of a pair, which keeps exactly one representative of
    # every within-batch duplicate chain).
    canon = D.exact_duplicate_groups(batch).select(
        F.col("canonical_id").alias("doc_id")
    )
    batch1 = batch.join(canon, "doc_id", "left_semi")
    inner = D.jaccard_pairs(batch1, threshold).select("id1", "id2")
    inner_losers = inner.select(F.col("id2").alias("doc_id")).distinct()
    batch2 = batch1.join(F.broadcast(inner_losers), "doc_id", "left_anti")

    # 2. batch-vs-corpus
    if corpus is not None:
        # 2a. EXACT content hash — covers every doc, including ones too
        # short to shingle (near-dup LSH drops <n-token docs, which would
        # otherwise bypass the gate entirely and break replay idempotency).
        # Batch hashes broadcast; corpus scanned map-side, same asymmetric
        # shape as the LSH leg.
        bh = batch2.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("_h")
        )
        exact_hits = (
            corpus.select(
                F.col("doc_id").alias("matched_doc_id"),
                F.md5(F.col("text").cast("binary")).alias("_h"),
            )
            .join(F.broadcast(bh), "_h")
            .select("doc_id", "matched_doc_id", F.lit(1.0).alias("jaccard"))
        )
        # 2b. near-dup LSH on whatever survives shingling
        near_hits = D.incremental_minhash_pairs(batch2, corpus, threshold).select(
            F.col("new_id").alias("doc_id"),
            F.col("corpus_id").alias("matched_doc_id"),
            "jaccard",
        )
        rejects = exact_hits.unionByName(near_hits)
        # one report row per doc: best match wins (ties by corpus id)
        w = Window.partitionBy("doc_id").orderBy(
            F.col("jaccard").desc(), F.col("matched_doc_id")
        )
        rejects = (
            rejects.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        survivors = batch2.join(
            F.broadcast(rejects.select("doc_id")), "doc_id", "left_anti"
        )
    else:
        rejects = batch2.sparkSession.createDataFrame(
            [], "doc_id long, matched_doc_id long, jaccard double"
        )
        survivors = batch2
    return survivors, rejects


def start_dedup_gate(
    stream: DataFrame,
    corpus_path: str,
    report_path: str,
    checkpoint: str,
    threshold: float = 0.3,
):
    """Wire :func:`gate_batch` into a foreachBatch sink: survivors append
    to the corpus store, rejects append to the quarantine report."""
    from kafka_clickhouse_example_spark.sinks.backfill import _table_exists

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        corpus = (
            spark.read.parquet(corpus_path)
            if _table_exists(spark, corpus_path)
            else None
        )
        survivors, rejects = gate_batch(batch_df, corpus, threshold)
        # rejects first: if the job dies between the two writes, the replay
        # re-gates the batch — landed survivors then self-reject (jaccard
        # 1.0 vs their own copies), so the corpus never double-lands a doc.
        rejects.write.mode("append").parquet(report_path)
        survivors.write.mode("append").parquet(corpus_path)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
