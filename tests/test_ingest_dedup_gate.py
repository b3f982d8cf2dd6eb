"""Streaming ingest dedup gate: within-batch dupes collapse, cross-batch
near-dups are quarantined with their match, novel docs land, and a full
crash-replay cannot double-land documents (the gate self-rejects replayed
copies)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.pipelines.ingest_dedup import start_dedup_gate

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
NOVEL = (
    "one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)
OTHER = (
    "red orange yellow green blue indigo violet black white gray "
    "cyan magenta maroon olive navy teal silver gold bronze copper"
)


def _doc(i: int, text: str) -> str:
    return json.dumps({"doc_id": i, "text": text})


@pytest.fixture()
def paths(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return {
        "src": src,
        "corpus": str(tmp_path / "corpus"),
        "report": str(tmp_path / "report"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(p["src"]))
    )
    q = start_dedup_gate(stream, p["corpus"], p["report"], ckpt)
    q.awaitTermination(180)


def test_gate_lands_novel_and_quarantines_dups(spark, paths):
    # batch 1: one doc + an exact in-batch copy; batch 2: a near-dup of
    # batch 1's doc (one word changed), plus a genuinely novel doc
    near = BASE.replace("kappa", "kappa2")
    short = "tiny doc"  # 2 tokens: zero 3-gram shingles, invisible to LSH
    (paths["src"] / "b1.json").write_text(
        "\n".join([_doc(1, BASE), _doc(2, BASE), _doc(3, OTHER), _doc(4, short)])
    )
    (paths["src"] / "b2.json").write_text(
        "\n".join([_doc(10, near), _doc(11, NOVEL), _doc(12, short)])
    )
    _run(spark, paths, paths["ckpt"])

    corpus = {r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()}
    # 2 = exact in-batch dup, 10 = near-dup of 1, 12 = exact copy of the
    # SHORT doc 4 — caught by the content-hash leg, not LSH
    assert corpus == {1, 3, 4, 11}
    report = {
        (r.doc_id, r.matched_doc_id)
        for r in spark.read.parquet(paths["report"]).collect()
    }
    assert report == {(10, 1), (12, 4)}

    # crash-replay: re-run the whole stream with a FRESH checkpoint — every
    # replayed doc self-rejects against its landed copy; corpus unchanged
    _run(spark, paths, paths["ckpt"] + "2")
    corpus2 = [r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()]
    assert sorted(corpus2) == [1, 3, 4, 11], "replay double-landed documents"
    # replayed self-matches (incl. the un-shingle-able short doc) were
    # quarantined at jaccard 1.0
    rr = spark.read.parquet(paths["report"])
    self_hits = rr.filter(F.col("doc_id") == F.col("matched_doc_id")).collect()
    assert {r.doc_id for r in self_hits} == {1, 3, 4, 11}
    assert all(r.jaccard == 1.0 for r in self_hits)
