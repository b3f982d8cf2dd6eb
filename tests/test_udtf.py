"""Spark 4 Python UDTF surface: a table-function chunker must agree row-for-
row with the production column-expression chunking plan (queries_corpus.
text_chunk_overlap). The UDTF is the API-breadth demo — row-at-a-time Python
is the slow path; the explode/substring plan is what runs at scale."""

from __future__ import annotations

from pyspark.sql.functions import udtf

from kafka_clickhouse_example_spark.plans.queries_corpus import CHUNK, STRIDE
from kafka_clickhouse_example_spark.registry import all_queries


@udtf(returnType="doc_id bigint, chunk_no bigint, chunk_text string, chunk_len int")
class ChunkDocs:
    def eval(self, doc_id: int, text: str):
        for i, pos in enumerate(range(0, max(len(text), 1), STRIDE)):
            piece = text[pos : pos + CHUNK]
            yield doc_id, i, piece, len(piece)


def test_udtf_chunker_matches_column_plan(spark, sf_dir):
    spark.udtf.register("chunk_docs", ChunkDocs)
    docs = all_queries()  # force registry load for the reference query
    ref = [
        (r.doc_id, r.chunk_no, r.chunk_text, r.chunk_len)
        for r in docs["text_chunk_overlap"](spark, sf_dir).collect()
    ]
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

    load_compute_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    got = [
        (r.doc_id, r.chunk_no, r.chunk_text, r.chunk_len)
        for r in spark.sql(
            "SELECT c.* FROM docs_udtf, LATERAL chunk_docs(doc_id, text) c "
            "ORDER BY doc_id, chunk_no"
        ).collect()
    ]
    assert got == ref and len(got) > 0
