"""Benchmark decontamination: flag training documents that overlap a
held-out evaluation set by word n-gram collision.

Training pipelines must remove (or at least flag) corpus documents that
leak evaluation content, or downstream benchmark numbers are inflated.
The standard published mechanism is n-gram overlap — GPT-3 (appendix C)
and PaLM scrub 8-13-gram collisions against each benchmark; the n-gram
length is a corpus property (long enough that chance collisions vanish,
short enough that paraphrased leaks still hit).

Scale shape (the part that matters at 100 TB):
- The EVAL side is tiny by construction — benchmarks are KBs-to-MBs
  against a multi-TB corpus — so its distinct shingle-hash set is
  broadcast; no shuffle of the corpus ever happens.
- The TRAIN side is a map-only pass: shingle (Arrow-batched, see
  operators/dedup.py), hash each shingle to a 56-bit integer
  (md5-derived, engine-reproducible), explode, hash-join against the
  broadcast eval set, then aggregate hit counts by doc_id. Cost is
  O(corpus tokens) map work + a shuffle of only the *hits* (rare by
  design), exactly like the dedup inverted-index operators.
- Joining on the 56-bit hash (not the shingle string) keeps shuffle and
  broadcast payloads at 8 bytes/key; a 1-MB benchmark broadcasts as a
  few hundred KB of longs.

Reuses the dedup tokenizer/shingler verbatim so decontamination and
near-dup detection agree on what an "n-gram" is (one definition,
oracle-mirrored in SQL both places).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.dedup import md5_half, with_shingles

DECONTAM_NGRAM = 4


def eval_shingle_hashes(
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """Distinct 56-bit shingle hashes of the evaluation set (the broadcast
    side). One row per distinct n-gram across all eval docs."""
    return (
        with_shingles(eval_df, text_col, id_col, n=n, drop_empty=False)
        .select(F.explode("sh").alias("_s"))
        .select(md5_half(F.col("_s"), 0).alias("h"))
        .distinct()
    )


def contamination_hits(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """(doc_id, n_shared_shingles) for every train doc sharing at least one
    word n-gram with the eval set.

    The returned relation is the *contamination report*; callers drop or
    down-weight the listed ids (an anti-join against this result is the
    "decontaminate" action and stays broadcast-sized for real benchmarks).
    """
    train_sh = (
        with_shingles(train_df, text_col, id_col, n=n, drop_empty=False)
        .select("doc_id", F.explode("sh").alias("_s"))
        .select("doc_id", md5_half(F.col("_s"), 0).alias("h"))
    )
    ev = eval_shingle_hashes(eval_df, text_col, id_col, n=n)
    return (
        train_sh.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count_distinct("h").cast("long").alias("n_shared_shingles"))
    )
