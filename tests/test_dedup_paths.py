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


def test_shingles_arrow_equals_jvm_on_hostile_whitespace(spark):
    """ADVICE r1: tab/newline-padded and unicode-whitespace text must
    tokenize identically on the Arrow and column paths (Spark trim() strips
    ASCII spaces only; Java \\s is the ASCII class; split keeps boundary
    empty tokens). NBSP/CJK spaces are NOT separators on either path."""
    rows = [
        (1, "aa bb cc dd"),
        (2, "\taa bb cc dd\n"),        # leading/trailing ASCII whitespace
        (3, "  aa bb cc dd  "),         # space padding (trimmed)
        (4, "aa bb cc dd ee"),     # NBSP inside a token
        (5, "aa　bb cc dd ee"),     # CJK space inside a token
        (6, "aa\nbb\tcc\rdd"),          # mixed ASCII separators
        (7, ""),
        (8, "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=True).collect()
    }
    jvm = {
        (r["doc_id"], tuple(r["sh"]))
        for r in D.with_shingles(docs, use_arrow=False).collect()
    }
    assert arrow == jvm


def test_compression_ratio_matches_zlib(spark, sf_dir):
    """text_compression_ratio ≡ direct CPython zlib at level 6, every row."""
    import zlib

    from kafka_clickhouse_example_spark.registry import all_queries
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

    got = {
        r.doc_id: (r.n_chars, r.compressed_len)
        for r in all_queries()["text_compression_ratio"](spark, sf_dir).collect()
    }
    docs = load_compute_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {
        r.doc_id: (len(r.text), len(zlib.compress(r.text.encode("utf-8"), 6)))
        for r in docs
    }
    assert got == want and len(got) > 0
