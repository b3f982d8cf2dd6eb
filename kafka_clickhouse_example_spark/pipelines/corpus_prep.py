"""End-to-end training-corpus preparation: the composed job a user of this
engine actually runs, wiring the operator library into one pipeline:

    load documents
      -> quality gate        (text.with_quality_metrics, map-side)
      -> exact dedup         (content-hash canonical, keeps min doc_id)
      -> near-dup dedup      (Jaccard pairs -> connected components ->
                              keep the highest-quality member per cluster)
      -> decontamination     (drop docs sharing n-grams with the eval set)
      -> PII scrub           (pii.pii_redact in place + incidence count)
      -> split assignment    (deterministic hash 80/10/10)
      -> partitioned write   (parquet partitioned by split, lang)

Every stage is the certified operator from the registry — this module adds
only the composition and a per-stage accounting report. Scale notes live
with each operator; the composition itself adds no new shuffle beyond the
operators' own (the gates are map-side filters; the near-dup drop list and
contamination report are broadcast anti-joins, KB-to-MB-scale by
construction at any corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.operators import pii as P
from kafka_clickhouse_example_spark.operators import text as T
from kafka_clickhouse_example_spark.operators.decontam import contamination_hits
from kafka_clickhouse_example_spark.operators.sampling import with_split


def prepare_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    eval_df: DataFrame | None = None,
    quality_floor: float = 0.35,
    jaccard_threshold: float = 0.3,
) -> dict[str, int]:
    """Run the full preparation pipeline; write the training corpus to
    ``out_dir`` partitioned by (split, lang); return per-stage counts.

    Dedup keep-rules: exact duplicates keep the minimum doc_id; near-dup
    clusters keep the highest-quality member (doc_id tiebreak) — the same
    decisions the certified dedup_exact_groups / dedup_canonical_selection
    queries make, so the pipeline's behavior is oracle-anchored.
    """
    stats: dict[str, int] = {"input": docs.count()}

    # Each kept_* stage is materialized (eager localCheckpoint, same memo
    # pattern as queries_dedup._shingled): the per-stage accounting counts
    # and every downstream stage would otherwise re-execute the whole
    # uncached upstream chain — ~5 full corpus re-computations by the
    # final write.
    # 1. quality gate — map-side filter, no shuffle
    scored = T.with_quality_metrics(docs)
    kept_q = scored.filter(F.col("quality_score") >= quality_floor).localCheckpoint(
        eager=True
    )
    stats["after_quality"] = kept_q.count()

    # 2. exact dedup — keep the canonical (min id) copy of each text
    canon = D.exact_duplicate_groups(kept_q).select(
        F.col("canonical_id").alias("doc_id")
    )
    kept_e = kept_q.join(canon, "doc_id", "left_semi").localCheckpoint(eager=True)
    stats["after_exact_dedup"] = kept_e.count()

    # 3. near-dup dedup — pair graph -> components -> best-quality survivor
    pairs = D.jaccard_pairs(kept_e, jaccard_threshold).select("id1", "id2")
    clusters = D.duplicate_clusters(pairs)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    losers = (
        clusters.join(
            kept_e.select("doc_id", "quality_score"), "doc_id"
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id")
    )
    kept_n = kept_e.join(F.broadcast(losers), "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    stats["after_neardup"] = kept_n.count()

    # 4. decontamination — drop anything sharing an n-gram with eval
    if eval_df is not None:
        hits = contamination_hits(kept_n, eval_df).select("doc_id")
        kept_c = kept_n.join(F.broadcast(hits), "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
    else:
        kept_c = kept_n
    stats["after_decontam"] = kept_c.count()

    # 5. PII scrub — redact in place (map-side, no shuffle) and account for
    # how many surviving docs carried any identifier; a release gate would
    # alert on this number rather than ship it
    scanned = P.pii_scan(kept_c)
    stats["docs_with_pii"] = scanned.filter(F.col("n_pii") > 0).count()
    # redact in place and recompute n_chars — shipping the pre-redaction
    # length would silently desync metadata for every scrubbed doc
    kept_p = kept_c.withColumn("text", P.redact_expr(F.col("text"))).withColumn(
        "n_chars", F.length("text").cast("long")
    )

    # 6. split + partitioned write
    final = with_split(kept_p, "doc_id").select(
        "doc_id", "text", "lang", "source", "n_chars", "split"
    )
    final.write.mode("overwrite").partitionBy("split", "lang").parquet(out_dir)
    stats["written"] = spark.read.parquet(out_dir).count()
    return stats


def shard_training_corpus(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    *,
    n_shards: int = 16,
    max_records_per_file: int = 100_000,
) -> dict[str, int]:
    """Training handoff: take the prepared corpus's TRAIN split and write
    it as shuffle-ordered shards — the deterministic global shuffle of
    sample_shuffle_shards applied for real (md5 shard + within-shard md5
    sort), partitioned by shard with ``maxRecordsPerFile`` splitting
    inside tasks. Readers stream shards independently in a
    locality-broken, reproducible order; no shard_pos column is
    materialized (within-file order encodes it, exactly as the query's
    100 TB note prescribes).

    Scale: one hash exchange on the shard key + per-shard local sorts;
    file sizing is handled by the writer per task — no driver accounting.
    Returns per-shard row counts (n_shards entries, driver-bounded).
    """
    from kafka_clickhouse_example_spark.operators.sampling import hash_bucket

    train = spark.read.parquet(corpus_dir).filter(F.col("split") == "train")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    sharded = (
        train.withColumn("shard", hash_bucket(F.col("doc_id"), n_shards).cast("bigint"))
        .withColumn("_h", h)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_h", "doc_id")
        .drop("_h")
    )
    (
        sharded.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    out = spark.read.parquet(out_dir)
    return {
        int(r["shard"]): int(r["n"])
        for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
