"""Arrow (pandas UDF) and JVM (column expression) dedup paths must produce
identical arrays — the Arrow path exists purely because Catalyst's
interpreted higher-order functions are ~6x slower, never to change
semantics."""

from __future__ import annotations

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.sources.catalog import load_table


def test_shingles_arrow_equals_jvm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    arrow = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=True).collect()
    }
    jvm = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=False).collect()
    }
    assert arrow == jvm


def test_minhash_arrow_equals_jvm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = D.with_shingles(docs)
    arrow = {
        (r["doc_id"], tuple(r["mh"]))
        for r in D.with_minhash_signature(sh, use_arrow=True).collect()
    }
    jvm = {
        (r["doc_id"], tuple(r["mh"]))
        for r in D.with_minhash_signature(sh, use_arrow=False).collect()
    }
    assert arrow == jvm
