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

SERVED MODE (gate_batch_served / start_dedup_gate_served): the same gate
consulting the materialized relations of operators/dedup_store.py instead
of recomputing hashes and band keys over the whole corpus per batch — the
O(corpus)->O(delta + stored-key scan) upgrade the term/ANN indexes already
have. Served mode also upgrades delivery: survivors land in the corpus by
LABELED dynamic partition overwrite (kb=b<batch_id>), so a replayed batch
rewrites its own partition with identical content — exactly-once corpus
content without relying on the self-reject argument above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import dedup as D


def _dedup_within_batch(batch: DataFrame, threshold: float) -> DataFrame:
    """Batch-internal dedup: exact first (content hash), then near-dup
    pairs — keep the min doc_id of every connected pair (cheap transitive
    approximation for a batch-sized set: reject anything that appears as
    the larger id of a pair, which keeps exactly one representative of
    every within-batch duplicate chain).

    NULL-text docs are invisible to the exact leg here, exactly as they
    are on every corpus leg (content_hash yields NULL, which equi-joins
    never match — dedup.content_hash docstring): two NULL-text docs in one
    micro-batch both survive, matching their always-lands behavior against
    the corpus. Without the filter, groupBy would treat the NULL hashes as
    equal and silently collapse them with no reject-report row."""
    h = D.content_hash("text")
    canon = D.exact_duplicate_groups(batch.filter(h.isNotNull())).select(
        F.col("canonical_id").alias("doc_id")
    )
    batch1 = batch.filter(h.isNull()).unionByName(
        batch.join(canon, "doc_id", "left_semi")
    )
    inner = D.jaccard_pairs(batch1, threshold).select("id1", "id2")
    inner_losers = inner.select(F.col("id2").alias("doc_id")).distinct()
    return batch1.join(F.broadcast(inner_losers), "doc_id", "left_anti")


def _resolve(
    batch2: DataFrame, exact_hits: DataFrame, near_hits: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Combine the two hit legs into (survivors, rejects): one report row
    per rejected doc — best match wins (ties by corpus id)."""
    rejects = exact_hits.unionByName(near_hits)
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
    return survivors, rejects


def _empty_rejects(batch: DataFrame) -> DataFrame:
    return batch.sparkSession.createDataFrame(
        [], "doc_id long, matched_doc_id long, jaccard double"
    )


def gate_batch(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float,
) -> tuple[DataFrame, DataFrame]:
    """Pure (testable) core: returns (survivors, rejects_report) for one
    batch against the corpus (None = empty store)."""
    batch2 = _dedup_within_batch(batch, threshold)

    # 2. batch-vs-corpus
    if corpus is not None:
        # 2a. EXACT content hash — covers every doc, including ones too
        # short to shingle (near-dup LSH drops <n-token docs, which would
        # otherwise bypass the gate entirely and break replay idempotency).
        # Batch hashes broadcast; corpus scanned map-side, same asymmetric
        # shape as the LSH leg.
        bh = batch2.select("doc_id", D.content_hash("text").alias("_h"))
        exact_hits = (
            corpus.select(
                F.col("doc_id").alias("matched_doc_id"),
                D.content_hash("text").alias("_h"),
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
        survivors, rejects = _resolve(batch2, exact_hits, near_hits)
    else:
        rejects = _empty_rejects(batch2)
        survivors = batch2
    return survivors, rejects


def gate_batch_served(
    batch: DataFrame,
    store_path: str,
    threshold: float,
    *,
    exclude_label: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """gate_batch against the MATERIALIZED relations of
    operators/dedup_store.py — identical semantics (row-for-row parity
    pinned by tests), O(delta + stored-key scan) per batch instead of
    O(corpus) recompute. ``exclude_label`` must be the current batch's
    landing label in streaming use: a replayed batch must never gate
    against its own half-landed debris (see dedup_store docstring).

    The within-batch relation and the rejects report are lineage-cut
    internally (batch-sized), so consuming BOTH returned frames evaluates
    the gate once, not once per consumer — the streaming sink writes
    rejects, the corpus, and the store update from one evaluation.

    Fail-loud contracts, so a broken store can never masquerade as an
    empty corpus: dedup_store.check_store_servable refuses — before any
    batch work is spent — a crashed/in-flight bulk build
    (state=building), a complete build whose data vanished, a key profile
    differing from the current constants (even on a store with no hash
    rows yet), a missing hashes relation while a sibling relation holds
    live foreign rows (hashes lost out-of-band on a streaming-built store
    — serving it as empty would land every duplicate), and live hash rows
    with a missing sibling (crashed build: the near leg would be silently
    dark). All sibling-consistency checks honor ``exclude_label``."""
    from kafka_clickhouse_example_spark.operators import dedup_store as DS

    spark = batch.sparkSession
    # refuse before batch work; covers every broken-store window including
    # sibling inconsistency (exclude_label-aware)
    DS.check_store_servable(spark, store_path, exclude_label=exclude_label)
    batch2 = _dedup_within_batch(batch, threshold).localCheckpoint(eager=True)
    hashes = DS.read_relation(spark, store_path, "hashes", exclude_label=exclude_label)
    if hashes is None:
        # servable + no hashes relation ⇒ the siblings hold no live
        # foreign rows either: genuinely empty corpus
        return batch2, _empty_rejects(batch2)

    bh = batch2.select("doc_id", D.content_hash("text").alias("_h"))
    exact_hits = (
        hashes.select(F.col("doc_id").alias("matched_doc_id"), F.col("h").alias("_h"))
        .join(F.broadcast(bh), "_h")
        .select("doc_id", "matched_doc_id", F.lit(1.0).alias("jaccard"))
    )
    shingles = DS.read_relation(
        spark, store_path, "shingles", exclude_label=exclude_label
    )
    bands = DS.read_relation(spark, store_path, "bands", exclude_label=exclude_label)
    if shingles is None or bands is None:
        # check_store_servable already refused live-hashes-with-missing-
        # sibling (the half-built store); reaching here means the store is
        # in the first-batch crash window — at most the crashed label's own
        # rows, excluded, hence semantically empty for the near leg.
        near_hits = _empty_rejects(batch2)
    else:
        near_hits = D.incremental_minhash_pairs(
            batch2,
            corpus_df=None,  # unused: both stored relations supplied
            threshold=threshold,
            corpus_shingles=shingles,
            corpus_bands=bands,
        ).select(
            F.col("new_id").alias("doc_id"),
            F.col("corpus_id").alias("matched_doc_id"),
            "jaccard",
        )
    survivors, rejects = _resolve(batch2, exact_hits, near_hits)
    # cut the rejects (tiny): survivors = batch2 anti-join rejects, so with
    # both inputs materialized every downstream consumer pays only the
    # anti-join, never a gate re-evaluation
    rejects = rejects.localCheckpoint(eager=True)
    survivors = batch2.join(
        F.broadcast(rejects.select("doc_id")), "doc_id", "left_anti"
    )
    return survivors, rejects


def start_dedup_gate(
    stream: DataFrame,
    corpus_path: str,
    report_path: str,
    checkpoint: str,
    threshold: float = 0.3,
    store_path: str | None = None,
):
    """Wire the gate into a foreachBatch sink: survivors land in the
    corpus, rejects append to the quarantine report.

    ``store_path`` given ⇒ SERVED MODE (the production default): every
    batch gates against the materialized relations of
    operators/dedup_store.py and maintains them incrementally — the corpus
    text is never re-read or re-hashed, so per-batch cost is O(batch +
    stored-key scan) regardless of corpus size, and corpus landings are
    labeled overwrites (exactly-once content). ``store_path=None`` falls
    back to live compute: the corpus parquet is re-read and re-keyed on
    every micro-batch (two full corpus scans per batch) — acceptable only
    while the corpus is small. Choose the mode at pipeline creation: the
    two modes write different corpus layouts (labeled kb partitions vs
    plain appends), so switching mid-lineage requires a corpus rewrite
    plus build_dedup_store."""
    if store_path is not None:
        return start_dedup_gate_served(
            stream, corpus_path, store_path, report_path, checkpoint, threshold
        )
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


def start_dedup_gate_served(
    stream: DataFrame,
    corpus_path: str,
    store_path: str,
    report_path: str,
    checkpoint: str,
    threshold: float = 0.3,
):
    """The served gate as a foreachBatch sink: gates each micro-batch
    against the materialized store (never rescanning or re-hashing the
    corpus), then lands survivors + their store relations under the
    batch's own label.

    Delivery: corpus and store landings are LABELED dynamic partition
    overwrites (kb=b<batch_id>) — a replayed batch rewrites its own
    partitions with identical content, so corpus CONTENT is exactly-once
    (stronger than start_dedup_gate's self-reject argument). Gating
    excludes the batch's own label, so replay after any mid-landing crash
    gates exactly as the first attempt did. The quarantine report stays a
    plain append: at-least-once, duplicate report rows across a failure
    boundary are possible and benign (audit data, deduped by doc_id on
    read).

    Label contract: exactly-once holds within ONE checkpoint lineage,
    where a given batch_id always denotes the same source slice. Starting
    over with a FRESH checkpoint against an EXISTING corpus/store reuses
    labels for different content and overwrites history — treat a
    checkpoint reset as a rebuild (new corpus_path/store_path, or
    build_dedup_store from the surviving corpus first). This is the same
    contract as the ANN index's labeled streaming merges
    (operators/ann_index.py:start_ann_index_sink).
    """
    from kafka_clickhouse_example_spark.operators import dedup_store as DS
    from kafka_clickhouse_example_spark.sinks.backfill import overwrite_partitions

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        label = f"b{batch_id}"
        # both returned frames are lineage-cut inside the served gate: the
        # three writers below each pay one batch-sized anti-join, never a
        # gate re-evaluation
        survivors, rejects = gate_batch_served(
            batch_df, store_path, threshold, exclude_label=label
        )
        rejects.write.mode("append").parquet(report_path)
        overwrite_partitions(
            survivors.withColumn("kb", F.lit(label)), corpus_path, ["kb"]
        )
        DS.update_dedup_store(survivors, store_path, label)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
