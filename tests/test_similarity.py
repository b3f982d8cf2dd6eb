"""Cross-validation of the two similarity kernels: the exact fold kernel
(oracle-checked) vs the numpy/Arrow throughput kernel."""

from __future__ import annotations

import pytest

from kafka_clickhouse_example_spark.registry import all_queries


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    q = all_queries()
    exact = q["sim_topk_bruteforce"](spark, sf_dir).collect()
    fast = q["sim_topk_pandas"](spark, sf_dir).collect()
    return exact, fast


def test_pandas_kernel_matches_exact_ranks(results):
    exact, fast = results
    assert len(exact) == len(fast) > 0
    assert [(r.qid, r.vec_id, r.rank) for r in exact] == [
        (r.qid, r.vec_id, r.rank) for r in fast
    ]


def test_pandas_kernel_matches_exact_cosines(results):
    exact, fast = results
    for e, f in zip(exact, fast):
        assert abs(e.cosine_sim - f.cosine_sim) < 1e-9
