"""End-to-end corpus-preparation pipeline: stage accounting is monotonic,
the output really is exact- and near-dup free at the pipeline's own
thresholds, decontamination removes the planted contamination, splits are
disjoint/exhaustive, and the layout is partitioned by (split, lang)."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.pipelines.corpus_prep import prepare_corpus
from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

JACCARD = 0.3


@pytest.fixture(scope="module")
def prepared(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prep") / "corpus")
    base = load_compute_table(spark, sf_dir, "documents")
    # the synthetic corpus plants NEAR-dups but no byte-identical copies;
    # add exact copies under fresh ids so the exact-dedup stage has work
    copies = base.filter(F.col("doc_id") % 101 == 7).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    # plant one PII-bearing doc (unique English text so it survives the
    # quality gate and both dedup stages) so the scrub stage has real work
    pii_text = (
        "the quick brown fox jumps over the lazy dog and then writes to "
        "john.doe@example.com about the weather in the city where the river runs"
    )
    planted_pii = spark.createDataFrame(
        [(3_000_000, pii_text, "en", "src0", len(pii_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs = base.unionByName(copies).unionByName(planted_pii)
    # plant an eval set that overlaps real docs so decontamination must act
    eval_df = base.filter(F.col("doc_id") % 97 == 3).select("doc_id", "text")
    stats = prepare_corpus(spark, docs, out, eval_df=eval_df)
    return base, out, stats


def test_stage_accounting_monotonic(prepared):
    docs, out, stats = prepared
    order = ["input", "after_quality", "after_exact_dedup", "after_neardup",
             "after_decontam", "written"]
    vals = [stats[k] for k in order]
    assert vals[0] > 0 and all(a >= b for a, b in zip(vals, vals[1:])), stats
    assert stats["written"] == stats["after_decontam"]
    # every dedup/decontam stage did real work: the fixture plants exact
    # copies, the corpus plants near-dups, the eval set overlaps by
    # construction
    assert stats["after_exact_dedup"] < stats["after_quality"]
    assert stats["after_neardup"] < stats["after_exact_dedup"]
    assert stats["after_decontam"] < stats["after_neardup"]


def test_output_is_dedup_clean(spark, prepared):
    docs, out, stats = prepared
    final = spark.read.parquet(out)
    n = final.count()
    assert final.select(F.md5(F.col("text").cast("binary"))).distinct().count() == n
    assert D.jaccard_pairs(final, JACCARD).count() == 0


def test_output_is_decontaminated_and_split(spark, prepared):
    docs, out, stats = prepared
    final = spark.read.parquet(out)
    eval_ids = {r.doc_id for r in docs.filter(F.col("doc_id") % 97 == 3).collect()}
    # eval docs themselves (exact n-gram sharers) must be gone
    assert final.filter(F.col("doc_id").isin(list(eval_ids))).count() == 0
    splits = {r.split for r in final.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # hive layout: partition dirs by split then lang
    assert glob.glob(out + "/split=train/lang=*/*.parquet")


def test_output_is_pii_scrubbed(spark, prepared):
    from kafka_clickhouse_example_spark.operators import pii as P

    docs, out, stats = prepared
    final = spark.read.parquet(out)
    # the planted PII doc survived to the scrub stage and was counted
    assert stats["docs_with_pii"] >= 1
    planted = final.filter(F.col("doc_id") == 3_000_000).collect()
    assert len(planted) == 1
    assert "[EMAIL]" in planted[0].text and "@" not in planted[0].text
    # nothing that ships still matches any PII pattern
    assert P.pii_scan(final).filter(F.col("n_pii") > 0).count() == 0
    # n_chars metadata stays consistent with the REDACTED text
    assert final.filter(F.col("n_chars") != F.length("text")).count() == 0


def test_shard_training_corpus_handoff(spark, prepared, tmp_path):
    """Sharding the prepared corpus: exactly the train split, every doc in
    exactly one shard, within-file order = the deterministic md5 rank
    (the shard_pos-free contract), and a re-run is content-identical."""
    import hashlib

    from kafka_clickhouse_example_spark.pipelines.corpus_prep import (
        shard_training_corpus,
    )

    docs, out, stats = prepared
    shard_dir = str(tmp_path / "shards")
    counts = shard_training_corpus(spark, out, shard_dir, n_shards=8)
    train_ids = {
        r.doc_id
        for r in spark.read.parquet(out).filter(F.col("split") == "train").collect()
    }
    assert sum(counts.values()) == len(train_ids)
    assert set(counts) <= set(range(8))
    sharded = spark.read.parquet(shard_dir)
    assert {r.doc_id for r in sharded.select("doc_id").collect()} == train_ids
    # within-file order: md5-rank ascending (read one file raw, no sort)
    import glob as g

    f = sorted(g.glob(shard_dir + "/shard=*/*.parquet"))[0]
    ids = [r.doc_id for r in spark.read.parquet(f).select("doc_id").collect()]
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    assert keys == sorted(keys), "file order must be the md5 shuffle order"
    # deterministic re-run
    again = str(tmp_path / "shards2")
    assert shard_training_corpus(spark, out, again, n_shards=8) == counts
