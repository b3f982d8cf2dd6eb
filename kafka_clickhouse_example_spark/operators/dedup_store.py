"""Materialized dedup-gate index: the third serving layout.

The streaming ingest gate (pipelines/ingest_dedup.py:gate_batch) recomputes
md5 content hashes and 64-perm minhash band keys over the ENTIRE
accumulated corpus on every micro-batch — two full corpus scans plus the
minhash Arrow kernel per batch, the dominant per-batch cost once the corpus
dwarfs the batch. The term index (operators/retrieval.py) and the ANN index
(operators/ann_index.py) already solved the same problem for their
families; this module gives the dedup gate its store. It materializes
exactly the three relations the gate consults:

    <path>/hashes/    kb=<label>/  (doc_id, h)    every doc (exact leg)
    <path>/bands/     kb=<label>/  (doc_id, bk)   docs with >=n-token text
    <path>/shingles/  kb=<label>/  (doc_id, sh)   same docs (verify leg)

``kb`` is the landing label (one per ingest batch). Every landing is a
DYNAMIC partition overwrite of its own kb partition (sinks/backfill.
overwrite_partitions), so replaying a micro-batch rewrites identical
content — the replay-idempotence idiom shared with the ANN index's labeled
merges and the matview partials. Serving EXCLUDES the current batch's own
label: after a mid-landing crash, the replayed batch must not gate against
its own half-landed debris (a hash row without its corpus text would make
the doc self-reject and vanish: hash present, data absent).

Per-batch serving cost: column-pruned scans of the stored hash and band
relations joined against BROADCAST batch-side keys, plus a
candidate-bounded fetch of stored shingle arrays — nothing corpus-sized is
recomputed. At 100 TB the stored relations are also far smaller than the
corpus text they index (16-byte hashes; 16 band keys/doc; shingle arrays
only for the verify candidates' partitions... the shingles relation is
corpus-sized but only candidate rows survive its broadcast semi-join).

The reference pipeline has no dedup at all (SURVEY §0) — extension
surface, certified by row-for-row parity with the live gate
(tests/test_ingest_dedup_gate.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.sinks.backfill import (
    _table_exists,
    overwrite_partitions,
)

RELATIONS = ("hashes", "bands", "shingles")


def _content_hash(text_col: str) -> F.Column:
    # identical expression to gate_batch's exact leg: NULL text -> NULL
    # hash, which equi-joins match never — NULL-text docs always pass the
    # exact leg (and shingle to nothing, so they pass the near leg too)
    return F.md5(F.col(text_col).cast("binary"))


def store_relations(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """The three gate relations for ``df``'s docs (no kb column yet).

    Shingle/minhash math is the live gate's own (operators/dedup), so
    stored keys and recomputed keys can never drift apart.
    """
    hashes = df.select(
        F.col(id_col).alias("doc_id"), _content_hash(text_col).alias("h")
    )
    sh = D.with_shingles(df, text_col, id_col).localCheckpoint(eager=True)
    bands = (
        D.with_minhash_signature(sh)
        .withColumn("bk", F.explode(D.band_keys(F.col("mh"))))
        .select("doc_id", "bk")
    )
    return {"hashes": hashes, "bands": bands, "shingles": sh}


def _land(rels: dict[str, DataFrame], path: str, label: str) -> None:
    for name in RELATIONS:
        overwrite_partitions(
            rels[name].withColumn("kb", F.lit(label)),
            os.path.join(path, name),
            ["kb"],
        )


def build_dedup_store(
    corpus: DataFrame,
    path: str,
    *,
    label: str = "base",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the gate relations for an existing corpus (one full
    scan — the LAST corpus-sized dedup cost the pipeline ever pays)."""
    rels = store_relations(corpus, text_col, id_col)
    for name in RELATIONS:
        (
            rels[name]
            .withColumn("kb", F.lit(label))
            .write.mode("overwrite")
            .partitionBy("kb")
            .parquet(os.path.join(path, name))
        )


def update_dedup_store(
    delta: DataFrame,
    path: str,
    label: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Merge a delta's relations in O(delta): dynamic overwrite of the
    delta's own kb partition in each relation. Re-running the same labeled
    delta (micro-batch replay) rewrites identical content — idempotent."""
    _land(store_relations(delta, text_col, id_col), path, label)


def read_relation(
    spark: SparkSession, path: str, name: str, *, exclude_label: str | None = None
) -> DataFrame | None:
    """One stored relation, or None if it doesn't exist yet (empty store).
    ``exclude_label`` filters out a landing label via partition pruning —
    the serving side of the crash-replay contract."""
    rel_path = os.path.join(path, name)
    if not _table_exists(spark, rel_path):
        return None
    df = spark.read.parquet(rel_path)
    if exclude_label is not None:
        df = df.filter(F.col("kb") != exclude_label)
    return df.drop("kb")
