"""Perceptual image hash contracts: determinism, 2x NN-upscale invariance,
the dHash one-pixel Hamming bound, and planted-pair recall of the
rows-only mm_image_phash_pairs query."""

from __future__ import annotations

import numpy as np

from kafka_clickhouse_example_spark.operators import multimodal as M


def _hash_of(spark, payloads: list[bytes], method: str) -> dict[int, int]:
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "media_id long, payload binary"
    )
    return {r.media_id: r.phash for r in M.image_phash(df, method=method).collect()}


def _payload(side: int, seed: int = 7) -> bytes:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, side * side, dtype=np.uint8).tobytes()


def test_identical_payloads_hash_equal(spark):
    p = _payload(20)
    for method in ("ahash", "dhash"):
        h = _hash_of(spark, [p, p], method)
        assert h[0] == h[1]


def test_invariant_under_2x_nn_upscale(spark):
    p = _payload(16)
    df = spark.createDataFrame([(0, p)], "media_id long, payload binary")
    up = M.resize_image(df, 32, 32).collect()[0].payload
    assert len(bytes(up)) == 32 * 32
    for method in ("ahash", "dhash"):
        h = _hash_of(spark, [p, bytes(up)], method)
        assert h[0] == h[1], f"{method} not upscale-invariant"


def test_dhash_one_pixel_edit_bounded(spark):
    p = bytearray(_payload(10))
    p2 = bytearray(p)
    p2[0] = (p2[0] + 97) % 256  # one source pixel changed
    h = _hash_of(spark, [bytes(p), bytes(p2)], "dhash")
    hamming = bin(h[0] ^ h[1]).count("1")
    # side 10 >= 9: the sample grids are duplicate-free, so one pixel sits
    # in at most one sampled cell and perturbs at most 2 comparisons
    assert hamming <= 2


def test_planted_pairs_all_found(spark, sf_dir):
    from kafka_clickhouse_example_spark.plans.queries_multimodal import (
        mm_image_phash_pairs,
    )

    rows = mm_image_phash_pairs(spark, sf_dir).collect()
    planted = {r.id1 for r in rows if r.id2 - r.id1 == 1_000_000}
    from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

    docs = load_compute_table(spark, sf_dir, "documents")
    expected = {
        r.doc_id for r in docs.filter("doc_id % 10 = 0").select("doc_id").collect()
    }
    assert planted == expected  # pigeonhole guarantee: no planted pair missed
    assert all(r.hamming <= 3 for r in rows)
