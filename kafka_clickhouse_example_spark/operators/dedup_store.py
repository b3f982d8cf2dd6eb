"""Materialized dedup-gate index: the third serving layout.

The streaming ingest gate (pipelines/ingest_dedup.py:gate_batch) recomputes
md5 content hashes and minhash band keys (MINHASH_PERMS wide — 8 in the
test profile, 64 in the documented production profile, dedup.py:53-65)
over the ENTIRE accumulated corpus on every micro-batch — two full corpus
scans plus the minhash Arrow kernel per batch, the dominant per-batch cost
once the corpus dwarfs the batch. The term index (operators/retrieval.py)
and the ANN index (operators/ann_index.py) already solved the same problem
for their families; this module gives the dedup gate its store. It
materializes exactly the relations the gate consults:

    <path>/hashes/    kb=<label>/  (doc_id, h)    every doc (exact leg)
    <path>/bands/     kb=<label>/  (doc_id, bk)   docs with >=n-token text
    <path>/shingles/  kb=<label>/  (doc_id, sh)   same docs (verify leg)
    <path>/meta/                   (n_gram, num_perms, band_rows) 1 row

``meta`` records the key-construction profile the store was built with;
serving validates it against the module constants and REFUSES a store
whose stored band keys could not collide with freshly-computed batch keys
(a silent near-leg blackout otherwise — no error, every near-dup lands).

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
recomputed. Build cost is ONE corpus scan: (doc_id, hash, shingles)
project in a single pass, lineage cut once, all three relations derived
from the cut.

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

# Build-lifecycle marker. build_dedup_store brackets its landing with
# state=building ... state=complete, so a crashed BULK build is
# distinguishable from the streaming first-batch crash window (meta present,
# hashes absent, NO state relation — update_dedup_store never writes state).
# Without the marker those two windows are byte-identical on disk, and the
# crashed-build one is the dangerous half: a real corpus exists but its
# store relations don't, so serving "empty store = empty corpus" silently
# lands every duplicate of the existing corpus.
STATE_BUILDING = "building"
STATE_COMPLETE = "complete"


def _current_meta() -> tuple[int, int, int]:
    return (D.NGRAM_DEFAULT, D.MINHASH_PERMS, D.LSH_BAND_ROWS)


def _write_state(spark: SparkSession, path: str, state: str) -> None:
    spark.createDataFrame([(state,)], "state string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "state"))


def read_store_state(spark: SparkSession, path: str) -> str | None:
    """The build-lifecycle state, or None for a store no bulk build ever
    touched (streaming-created stores carry no state relation). A committed
    but EMPTY state relation (zero rows — e.g. a partial out-of-band copy)
    also reads as None rather than crashing: an unknown lifecycle is the
    same serving posture as no lifecycle record at all."""
    state_path = os.path.join(path, "state")
    if not _table_exists(spark, state_path):
        return None
    row = spark.read.parquet(state_path).first()
    return row.state if row is not None else None


def store_relations(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """The three gate relations for ``df``'s docs (no kb column yet), from
    ONE scan: hash + shingle array project together, the lineage is cut
    once, and every relation derives from the cut. Shingle/minhash math is
    the live gate's own (operators/dedup), so stored keys and recomputed
    keys can never drift apart."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        D.content_hash(text_col).alias("h"),
        D.shingle_array(F.col(text_col)).alias("sh"),
    ).localCheckpoint(eager=True)
    hashes = base.select("doc_id", "h")
    sh = base.filter(F.size("sh") > 0).select("doc_id", "sh")
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


def _write_meta(spark: SparkSession, path: str) -> None:
    n, p, r = _current_meta()
    spark.createDataFrame(
        [(n, p, r)], "n_gram int, num_perms int, band_rows int"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def check_store_meta(spark: SparkSession, path: str) -> None:
    """Refuse to serve a store whose key-construction profile differs from
    the module's current constants: stored band keys would silently stop
    colliding with freshly-computed batch keys (near leg returns nothing,
    no error — every near-dup would land)."""
    meta_path = os.path.join(path, "meta")
    if not _table_exists(spark, meta_path):
        raise ValueError(
            f"dedup store at {path} has no meta relation — built by an "
            "incompatible version or the build crashed before meta landed; "
            "rebuild with build_dedup_store"
        )
    row = spark.read.parquet(meta_path).first()
    got = (row.n_gram, row.num_perms, row.band_rows)
    if got != _current_meta():
        raise ValueError(
            f"dedup store at {path} was built with (n_gram, num_perms, "
            f"band_rows)={got} but this build uses {_current_meta()} — "
            "stored band keys cannot collide with batch keys; rebuild"
        )


def check_store_servable(
    spark: SparkSession, path: str, *, exclude_label: str | None = None
) -> None:
    """Every fail-loud precondition for serving the store, checked BEFORE
    any batch work is spent (so a caller cannot be silently served an
    empty gate by a store that is actually broken):

    - state=building ⇒ a bulk build crashed mid-landing (or is in flight):
      a real corpus exists whose relations aren't committed — refuse.
    - state=complete but no committed hashes ⇒ data was lost after a
      successful build — refuse.
    - meta present ⇒ validate the key profile even if no hash rows exist
      yet: a profile mismatch must be loud on the FIRST call, not only
      once data lands (the silent near-leg blackout hazard).
    - hashes relation missing while a sibling relation holds LIVE rows
      (rows outside ``exclude_label``) ⇒ the siblings prove a corpus
      exists whose hashes were lost out-of-band — serving "empty store =
      empty corpus" would land every duplicate of it. Refuse.
    - live hash rows with a missing sibling relation ⇒ half-built store
      (crashed build): the near leg would be silently dark. Refuse.

    ``exclude_label`` must be the current batch's landing label in
    streaming use, exactly as for read_relation: a replayed batch's own
    half-landed debris never counts as evidence of a live corpus.

    The one relations-absent window that IS servable as empty: no state
    relation at all and no live foreign rows anywhere — only
    update_dedup_store creates stores without state, and its meta-first
    write means this is the genuine streaming first-batch crash window
    where the corpus really is empty."""
    state = read_store_state(spark, path)
    if state == STATE_BUILDING:
        raise ValueError(
            f"dedup store at {path} has an unfinished bulk build "
            "(state=building) — the corpus it was indexing exists but its "
            "relations are not committed; serving it as empty would land "
            "every duplicate silently. Re-run build_dedup_store."
        )
    hashes_exist = _table_exists(spark, os.path.join(path, "hashes"))
    if state == STATE_COMPLETE and not hashes_exist:
        raise ValueError(
            f"dedup store at {path} is marked complete but its hashes "
            "relation is gone — store data was removed out-of-band; rebuild "
            "with build_dedup_store"
        )
    if hashes_exist or _table_exists(spark, os.path.join(path, "meta")):
        check_store_meta(spark, path)
    # Sibling consistency. The isEmpty probes run ONLY when a relation dir
    # is missing (broken-store windows), so the steady-state serving cost
    # is two directory existence checks.
    if not hashes_exist:
        for sibling in ("bands", "shingles"):
            rel = read_relation(spark, path, sibling, exclude_label=exclude_label)
            if rel is not None and not rel.limit(1).isEmpty():
                raise ValueError(
                    f"dedup store at {path} has live {sibling} rows but "
                    "no hashes relation — hashes lost out-of-band; serving "
                    "this as an empty corpus would land every duplicate. "
                    "Rebuild with build_dedup_store."
                )
    else:
        missing = [
            s
            for s in ("shingles", "bands")
            if not _table_exists(spark, os.path.join(path, s))
        ]
        if missing:
            hashes = read_relation(
                spark, path, "hashes", exclude_label=exclude_label
            )
            if not hashes.limit(1).isEmpty():
                raise ValueError(
                    f"dedup store at {path} has live hash rows but no "
                    f"{'/'.join(missing)} relation — half-built store "
                    "(crashed build?); rebuild with build_dedup_store"
                )


def build_dedup_store(
    corpus: DataFrame,
    path: str,
    *,
    label: str = "base",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the gate relations for an existing corpus (one corpus
    scan — the LAST corpus-sized dedup cost the pipeline ever pays).

    Crash safety: the landing is bracketed by ``state=building`` ...
    ``state=complete``, with meta written LAST among the data relations. A
    build that dies anywhere in between leaves state=building on disk, and
    both serving (check_store_servable) and update_dedup_store refuse it —
    serving a crashed bulk build as "empty store = empty corpus" would
    silently land every duplicate of the corpus that build was indexing.
    Overwrite mode is pinned STATIC so a rebuild replaces the WHOLE
    relation including old streaming labels — a session configured with
    dynamic partitionOverwriteMode would otherwise keep stale kb
    partitions for documents no longer in the corpus."""
    spark = corpus.sparkSession
    _write_state(spark, path, STATE_BUILDING)
    rels = store_relations(corpus, text_col, id_col)
    for name in RELATIONS:
        (
            rels[name]
            .withColumn("kb", F.lit(label))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("kb")
            .parquet(os.path.join(path, name))
        )
    _write_meta(spark, path)
    _write_state(spark, path, STATE_COMPLETE)


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
    delta (micro-batch replay) rewrites identical content — idempotent.
    Ensures the meta record exists first (the streaming gate's first batch
    creates the store with no prior build; meta is config, so writing it
    is label-independent and replay-safe). Refuses a store mid-bulk-build:
    merging a delta into a half-landed build would be clobbered by the
    build's own static-overwrite landing."""
    spark = delta.sparkSession
    if read_store_state(spark, path) == STATE_BUILDING:
        raise ValueError(
            f"dedup store at {path} has an unfinished bulk build "
            "(state=building) — finish or re-run build_dedup_store before "
            "merging deltas"
        )
    if not _table_exists(spark, os.path.join(path, "meta")):
        _write_meta(spark, path)
    else:
        check_store_meta(spark, path)  # never append keys a reader can't match
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
