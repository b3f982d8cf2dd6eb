"""Deterministic-sampling queries over documents, with DuckDB oracles
recomputing the identical md5 bucket assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import sampling as SP
from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_table

_BUCKET = (
    f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT"
    f" % {SP.SPLIT_BUCKETS})"
)
_BUCKET_RATE = (
    f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT"
    f" % {SP.RATE_BUCKETS})"
)

SAMPLE_PCT = 10


@register(
    "sample_documents_10pct",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_BUCKET} < {SAMPLE_PCT}
ORDER BY doc_id
""",
)
def sample_documents_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample by doc_id hash: same rows on every engine,
    partitioning, and re-run — the property seed-based sampling lacks. The
    predicate is a pure row-local filter: no shuffle, scan-parallel at any
    corpus size."""
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.deterministic_sample(docs, "doc_id", SAMPLE_PCT)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "split_documents_train_val_test",
    oracle=f"""
SELECT CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
ORDER BY split
""",
)
def split_documents_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 train/val/test assignment by key hash: disjoint,
    exhaustive, append-stable (a doc's split never changes as the corpus
    grows) — the split discipline a training pipeline needs for leakage-free
    re-materialization."""
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.with_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


@register(
    "sample_documents_balanced_by_lang",
    oracle=f"""
WITH counts AS (SELECT lang, count(*) AS n_stratum FROM documents GROUP BY 1),
rates AS (
  SELECT lang,
         ({SP.RATE_BUCKETS} * (SELECT min(n_stratum) FROM counts))
           // n_stratum AS rate
  FROM counts
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {_BUCKET_RATE} < r.rate
ORDER BY doc_id
""",
)
def sample_documents_balanced_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (class-balancing) sample: each language keeps
    ``(10000 * min_lang_count) div lang_count`` per-10k of its docs by key
    hash — the majority class ('en', ~3x the rest) is downsampled toward
    the smallest stratum, deterministically and append-stably per stratum.
    1/10,000 rate resolution so a stratum up to 10,000x the smallest still
    downsamples instead of flooring to rate 0 and vanishing.

    Scale: two tiny aggregates (one row per stratum) broadcast back onto a
    scan-parallel filter — no shuffle of the corpus itself.
    """
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.balanced_sample(docs, "lang", "doc_id")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "sample_documents_weighted",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_BUCKET_RATE}
      < ({SP.RATE_BUCKETS} * n_chars) // (SELECT max(n_chars) FROM documents)
ORDER BY doc_id
""",
)
def sample_documents_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample: longer documents are proportionally more
    likely to be kept (P = n_chars / max_n_chars), via exact integer rate
    arithmetic on a hash bucket — the deterministic form of quality-weighted
    corpus sampling. One scalar max broadcast; no corpus shuffle.
    """
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        SP.weighted_bernoulli_sample(docs, "n_chars", "doc_id")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "sample_pack_chunks",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
  CAST(floor(start_offset / 512) AS BIGINT) AS first_chunk,
  CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 512) AS BIGINT)
    AS last_chunk,
  CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 512)
       - floor(start_offset / 512) + 1 AS BIGINT) AS n_chunks
FROM c
ORDER BY doc_id
""",
)
def sample_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing at context 512: each document's
    exact span in the global token stream (exclusive-prefix-sum offset) and
    the chunk range it occupies. The prefix sum is the distributed two-pass
    algorithm in operators/packing.py — no single-partition window; the
    oracle is the single-node window-function definition of the same
    arithmetic."""
    from kafka_clickhouse_example_spark.operators import packing as PK
    from kafka_clickhouse_example_spark.operators import text as T

    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return PK.with_pack_chunks(docs).orderBy("doc_id")


TOKEN_QUOTA = 1000


@register(
    "sample_source_token_quota",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tokens_before
  FROM t
)
SELECT doc_id, source, n_tokens, tokens_before
FROM c WHERE tokens_before < {TOKEN_QUOTA}
ORDER BY doc_id
""",
)
def sample_source_token_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget curation: walk each source in doc_id order
    and keep documents until the source's token budget is spent (the first
    doc crossing the boundary is kept in full). Pretraining mixes cap
    sources by token mass, not document count — this is that cut,
    reproducible on any engine/partitioning. One shuffle on source; the
    running sum is a streaming window frame (operators/sampling.py
    with_token_quota)."""
    from kafka_clickhouse_example_spark.operators import text as T

    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return SP.with_token_quota(docs, TOKEN_QUOTA).orderBy("doc_id")


K_PER_GROUP = 20


@register(
    "sample_fixed_k_per_lang",
    oracle=f"""
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {K_PER_GROUP}
ORDER BY lang, doc_id
""",
)
def sample_fixed_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per group: exactly K docs per
    language, chosen by ranking on the md5 of the key — a reservoir
    sample whose membership is reproducible across engines, runs, and
    partitionings (seeded RNG reservoirs are none of those). doc_id
    tiebreak makes the cut total-ordered even under hash collisions.

    Scale: one shuffle on the group key; the window computes rank only —
    with K ≪ group size, Spark's WindowGroupLimit pushes the top-K cut
    into the partial sort, so no full group materializes.
    """
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K_PER_GROUP)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )


_BUCKET_T = (
    f"(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::BIGINT"
    f" % {SP.TEMPERATURE_BUCKETS})"
)


@register(
    "sample_documents_temperature",
    oracle=f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
m AS (SELECT min(n) AS mn FROM c),
r AS (
  SELECT lang, n,
         ({SP.TEMPERATURE_BUCKETS} * CAST(floor(sqrt(CAST(mn AS DOUBLE))) AS BIGINT))
           // CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS keep_rate
  FROM c CROSS JOIN m
)
SELECT d.lang, r.n AS n_docs, r.keep_rate, count(*) AS n_kept
FROM documents d JOIN r ON r.lang = d.lang
WHERE {_BUCKET_T} < r.keep_rate
GROUP BY 1, 2, 3
ORDER BY d.lang
""",
)
def sample_documents_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ=2 temperature rebalancing report per LANGUAGE (the skewed
    stratum: en is ~3x fr at sf0.01): original count, the derived integer
    keep rate (∝ 1/sqrt of the language's share), and the docs actually
    kept by the deterministic hash-bucket rule. The smallest language
    keeps all rows; a 4x-larger one keeps ~half. All integer math
    (isqrt + integer div) — no RNG, no libm divergence."""
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    kept = SP.temperature_sample(docs, "lang", "doc_id", keep_stats=True)
    return (
        kept.groupBy("lang")
        .agg(
            F.first("_n").alias("n_docs"),
            F.first("_rate").alias("keep_rate"),
            F.count("*").alias("n_kept"),
        )
        .orderBy("lang")
    )


_WK_PAYLOAD = (
    "SELECT doc_id, lang, source, n_chars,\n"
    "       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1) AS h\n"
    "FROM documents WHERE n_chars > 0 AND doc_id IS NOT NULL"
)


@register(
    "sample_documents_weighted_k",
    oracle=f"""
WITH {SP.log2fp_sql(_WK_PAYLOAD)}
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars
  FROM l2fin
  ORDER BY CAST({48 << SP.LOG2FP_FRAC_BITS} - l2fp AS DOUBLE)
             / CAST(n_chars AS DOUBLE),
           doc_id
  LIMIT 50
)
ORDER BY doc_id
""",
)
def sample_documents_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 documents drawn WITHOUT replacement with probability
    proportional to length (Efraimidis-Spirakis priorities over
    hash-uniform draws; operators/sampling.py). Rows-only through round 5
    because the ln() priority put a libm call on the selection boundary;
    now oracle-backed: the log runs in cross-engine integer fixed point
    (sampling.with_log2fp / sampling.log2fp_sql — both renderings
    generated from the same constants) and the only float op left is one
    IEEE-correctly-rounded double division, so DuckDB reproduces the
    selected set bit-for-bit.
    """
    from kafka_clickhouse_example_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        weighted_sample_without_replacement(docs, "n_chars", "doc_id", 50)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# --- deterministic global shuffle into training shards ------------------------

N_SHARDS = 16
_SHARD_SQL = (
    f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT"
    f" % {N_SHARDS})"
)


@register(
    "sample_shuffle_shards",
    oracle=f"""
SELECT doc_id,
       CAST({_SHARD_SQL} AS BIGINT) AS shard,
       CAST(row_number() OVER (
              PARTITION BY {_SHARD_SQL}
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
         AS shard_pos,
       n_chars
FROM documents
ORDER BY shard, shard_pos
""",
)
def sample_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into {N_SHARDS} training shards: every
    document gets a shard (md5 bucket of doc_id) and a position inside it
    (rank of its md5 hex digest) — the training-order step that breaks
    crawl/source locality WITHOUT a global sort, reproducible bit-for-bit
    on any engine, partitioning, or re-run (no seed state to lose).

    Scale: one hash shuffle on `shard` plus a PER-SHARD local sort on a
    16-byte key — cost is sort(corpus/N_SHARDS) per shard in parallel, vs
    a global orderBy's single range exchange over everything. At 100 TB
    the same plan writes each shard with maxRecordsPerFile and drops the
    materialized shard_pos (the within-file order already encodes it);
    readers stream shards independently. The final ORDER BY exists only
    for the deterministic gate.
    """
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    shard = SP.hash_bucket(F.col("doc_id"), N_SHARDS).cast("bigint")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", shard.alias("shard"), h.alias("h"), "n_chars")
        .withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "shard_pos", "n_chars")
        .orderBy("shard", "shard_pos")
    )


# --- length-bucketed batching (padding-efficient inference batches) -----------

LEN_BUCKET_WIDTH = 16  # token-count buckets: 0-15, 16-31, ...
BATCH_SIZE = 32
_NTOK_SQL = "len(string_split_regex(trim(text), '\\s+'))"
_LB_HASH = "md5(CAST(doc_id AS VARCHAR))"


@register(
    "sample_length_bucketed_batches",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, CAST({_NTOK_SQL} AS BIGINT) AS n_tok,
         CAST({_NTOK_SQL} AS BIGINT) // {LEN_BUCKET_WIDTH} AS bucket
  FROM documents
),
batched AS (
  SELECT bucket, n_tok,
         CAST((row_number() OVER (PARTITION BY bucket
                                  ORDER BY {_LB_HASH}, doc_id) - 1)
              // {BATCH_SIZE} AS BIGINT) AS batch_no
  FROM sized
)
SELECT bucket, batch_no,
       CAST(count(*) AS BIGINT) AS n_seqs,
       max(n_tok) AS max_tok,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST(max(n_tok) * count(*) - sum(n_tok) AS BIGINT) AS padding_tok,
       round(CAST(max(n_tok) * count(*) - sum(n_tok) AS DOUBLE)
             / CAST(max(n_tok) * count(*) AS DOUBLE), 6) AS padding_frac
FROM batched
GROUP BY bucket, batch_no
ORDER BY bucket, batch_no
""",
)
def sample_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic batching: assign every document to a
    token-length bucket (width {LEN_BUCKET_WIDTH}) and, within the bucket,
    to hash-ordered batches of {BATCH_SIZE}; report per-batch padding
    waste (pad-to-max cost) — the planning step batched inference/scoring
    runs so similar-length sequences share a batch instead of padding to
    the global max. Deterministic: hash order inside buckets, exact
    integer padding accounting.

    Scale: one hash exchange on `bucket` feeds the window (per-bucket
    local sort on a 16-byte key, same shape as sample_shuffle_shards),
    then a partial-combined groupBy on (bucket, batch_no). No global
    sort; output is batch-count-sized, not corpus-sized.
    """
    from pyspark.sql import Window

    from kafka_clickhouse_example_spark.operators.text import token_count

    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    ntok = token_count(F.col("text")).cast("bigint")
    sized = docs.select(
        "doc_id",
        ntok.alias("n_tok"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    ).withColumn("bucket", F.expr(f"n_tok div {LEN_BUCKET_WIDTH}"))
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    # `div`, not `/`: same exactness rule as corpus_mixture_plan (double
    # division is lossy past 2^53 and the oracle uses integer `//`)
    batched = sized.withColumn("rn", F.row_number().over(w)).withColumn(
        "batch_no", F.expr(f"(rn - 1) div {BATCH_SIZE}")
    )
    pad = F.max("n_tok") * F.count("*") - F.sum("n_tok")
    return (
        batched.groupBy("bucket", "batch_no")
        .agg(
            F.count("*").alias("n_seqs"),
            F.max("n_tok").alias("max_tok"),
            F.sum("n_tok").alias("sum_tok"),
            pad.alias("padding_tok"),
            F.round(
                pad.cast("double") / (F.max("n_tok") * F.count("*")).cast("double"), 6
            ).alias("padding_frac"),
        )
        .orderBy("bucket", "batch_no")
    )


_SRC_BUCKET = (
    f"(('0x' || substr(md5(source), 1, 14))::BIGINT % {SP.SPLIT_BUCKETS})"
)


@register(
    "split_documents_by_source",
    oracle=f"""
SELECT CASE WHEN {_SRC_BUCKET} < 80 THEN 'train'
            WHEN {_SRC_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
ORDER BY split
""",
)
def split_documents_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test split: the hash runs over ``source``, not
    doc_id, so every document of a source lands in the same split — the
    remediation for what dedup_split_leakage_audit detects (near-dups
    within a source straddling train/test leak eval signal; doc-level
    hashing guarantees it at scale, group-level hashing structurally
    prevents it). Same 80/10/10 bucket ladder and md5 device as the
    doc-level split; still stable under appends (new docs of a known
    source inherit its split).

    Scale: the split column is a row-local expression (no shuffle); the
    summary groupBy is the gate. Trade-off stated: split proportions now
    hold in expectation over SOURCES, not docs — skewed source sizes skew
    realized proportions (visible in n_docs here).
    """
    configure_runtime(spark)
    docs = load_table(spark, sf_dir, "documents")
    split = SP.with_split(docs, "source")
    return (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )
