"""Contract tests for the round-10 multiplicity-controlled scale corpus
(contrib/scale_sf30_probe.salted_text) — the device the sf30 probe uses
to separate a pair emitter's PLAN scaling from the offset corpus's
output-quadratic duplicate-multiplicity artifact.

Three properties make the device valid, each pinned here:
1. the per-copy token map is a bijection that preserves token count, so
   each copy's internal shingle structure is isomorphic to the base
   corpus (within-copy pairs == base pairs, offset);
2. cross-copy shingle overlap is exactly zero, so NO cross-copy pair
   survives the 0.3 Jaccard verify — pair output is exactly linear in
   copies;
3. the raw-corpus pair-count model used for the sf30 refusal arithmetic
   reproduces the round-9 measured raw-sf10 output exactly.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import dedup as D
from kafka_clickhouse_example_spark.sources.catalog import load_table

JACCARD_THRESHOLD = 0.3  # queries_dedup.JACCARD_THRESHOLD


def _probe_mod():
    spec = importlib.util.spec_from_file_location(
        "scale_sf30_probe_under_test",
        Path(__file__).resolve().parent.parent / "contrib" / "scale_sf30_probe.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["scale_sf30_probe_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _salted_copies(mod, base, copies: int, span: int):
    k = F.col("__copy")
    return base.crossJoin(
        base.sparkSession.range(copies).select(F.col("id").alias("__copy"))
    ).select(
        (F.col("doc_id") + k * F.lit(span)).alias("doc_id"),
        mod.salted_text(k).alias("text"),
    )


def test_salt_preserves_token_count_and_distinctness(spark, sf_dir):
    mod = _probe_mod()
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    salted = base.select(
        "doc_id", mod.salted_text(F.lit(7)).alias("text"), F.col("text").alias("orig")
    )
    tok = lambda c: F.split(F.trim(F.col(c)), r"\s+")  # noqa: E731
    bad = salted.filter(
        (F.size(tok("text")) != F.size(tok("orig")))
        | (F.size(F.array_distinct(tok("text"))) != F.size(F.array_distinct(tok("orig"))))
    ).count()
    assert bad == 0


def test_salted_pairs_are_exactly_per_copy_offset_images(spark, sf_dir):
    """Pair ISOMORPHISM, stronger than a count: the 3-copy salted corpus's
    EXACT-Jaccard pair set must be exactly the base pair set offset by
    k*span per copy — no pair lost (the bijection preserves within-copy
    shingle structure) and none gained (zero cross-copy overlap). Exact
    Jaccard is the right probe relation because it is salt-INVARIANT;
    minhash banding is not (the salt changes signature hashes, so LSH
    candidate recall varies slightly per copy — see the next test)."""
    mod = _probe_mod()
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    span = base.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = 3
    salted = _salted_copies(mod, base, copies, span)

    base_pairs = {
        (r["id1"], r["id2"])
        for r in D.jaccard_pairs(base, JACCARD_THRESHOLD).collect()
    }
    got = {
        (r["id1"], r["id2"])
        for r in D.jaccard_pairs(salted, JACCARD_THRESHOLD).collect()
    }
    want = {
        (i + k * span, j + k * span)
        for k in range(copies)
        for (i, j) in base_pairs
    }
    assert base_pairs, "fixture corpus must contain near-dup pairs"
    assert got == want


def test_salted_minhash_pairs_have_zero_cross_copy_leakage(spark, sf_dir):
    """For the LSH pipeline only the one-sided guarantee is deterministic:
    cross-copy Jaccard is exactly 0 < threshold, so the exact verify kills
    every cross-copy candidate whatever the banding does. Within-copy
    recall may drop a borderline pair per copy (salt-perturbed
    signatures), which keeps output LINEAR — the property the probe
    needs — without being bit-identical per copy."""
    mod = _probe_mod()
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    span = base.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = 3
    salted = _salted_copies(mod, base, copies, span)
    pairs = D.minhash_lsh_pairs(salted, JACCARD_THRESHOLD)
    cross = pairs.filter(
        (F.col("id1") / span).cast("bigint") != (F.col("id2") / span).cast("bigint")
    ).count()
    assert cross == 0


def test_refusal_model_reproduces_measured_sf10_output(spark):
    mod = _probe_mod()
    assert mod.forecast_minhash_pairs(100) == mod.R9_SF10_MINHASH["rows"]
    # and the sf30 forecast the refusal cites
    assert mod.forecast_minhash_pairs(300) == 247_290_000
