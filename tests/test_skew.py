"""Salted aggregation/join invariance: salting changes placement, never
results."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark):
    # Deliberately skewed: 90% of rows share key 1.
    rows = [(i, 1 if i % 10 else 2, float(i % 7)) for i in range(1000)]
    df = spark.createDataFrame(rows, "row_id long, k long, v double")
    plain = {
        (r["k"]): (str(r["total"]), r["n"])
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).alias("total"), F.count("v").alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (str(r["total"]), r["n"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": ("v", lambda c: F.sum(F.col(c).cast("decimal(18,2)")), F.sum),
                "n": ("v", F.count, F.sum),
            },
            salt_col=F.col("row_id"),
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [(i, 1 if i % 5 else 2) for i in range(500)], "row_id long, k long"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k long, label string")
    plain = {tuple(r) for r in big.join(small, "k").select("row_id", "label").collect()}
    salted = {
        tuple(r)
        for r in salted_join(big, small, "k", salt_col=F.col("row_id"), n_salts=8)
        .select("row_id", "label")
        .collect()
    }
    assert salted == plain
    # inner join drops unmatched small-side keys either way
    assert all(lbl in ("hot", "cold") for _, lbl in salted)


def test_approx_cardinality_within_bound(spark, sf_dir):
    """HLL estimate within its configured 1% rsd (allow 5% slack) of exact."""
    from pyspark.sql import functions as F
    from kafka_clickhouse_example_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, n, approx[k])


def test_weighted_sample_without_replacement_contracts(spark):
    from kafka_clickhouse_example_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, 1000.0 if i == 7 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample_without_replacement(df, "w", "id", 10)
    ids = {r.id for r in got.collect()}
    assert len(ids) == 10  # exactly k, no replacement
    assert 7 in ids  # a 1000x weight is effectively always drawn
    # deterministic across partitionings
    ids2 = {
        r.id
        for r in weighted_sample_without_replacement(
            df.repartition(13), "w", "id", 10
        ).collect()
    }
    assert ids == ids2
    # inclusion rate tracks weight: double-weight stratum should win more
    rows2 = [(i, 2.0 if i < 500 else 1.0) for i in range(1000)]
    df2 = spark.createDataFrame(rows2, "id long, w double")
    picked = {r.id for r in weighted_sample_without_replacement(df2, "w", "id", 200).collect()}
    heavy = sum(1 for i in picked if i < 500)
    assert heavy > 100  # more than the uniform expectation


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from kafka_clickhouse_example_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 1.0), (4, 1.0), (5, 1.0)], "id long, w double"
    )
    got = {r.id for r in weighted_sample_without_replacement(df, "w", "id", 5).collect()}
    # zero weight must not crash (ANSI divide-by-zero) and negative weight
    # must not auto-win; both are excluded entirely
    assert got == {3, 4, 5}


def _log2fp_reference(h: int, frac_bits: int = 20) -> int:
    """Pure-Python rendering of the fixed-point log2 — the executable
    spec both engine renderings must match bit-for-bit."""
    if h >= 1 << 48:
        return 48 << frac_bits
    e = h.bit_length() - 1
    t = (h << (47 - e)) >> 17  # mantissa in [2^30, 2^31)
    f = 0
    for _ in range(frac_bits):
        s = t * t
        if s >= 1 << 61:
            f = f * 2 + 1
            t = s >> 31
        else:
            f = f * 2
            t = s >> 30
    return (e << frac_bits) + f


def test_log2fp_spark_matches_python_and_duckdb(spark):
    import math
    import random

    import duckdb

    from kafka_clickhouse_example_spark.operators.sampling import (
        LOG2FP_FRAC_BITS,
        log2fp_sql,
        with_log2fp,
    )

    rng = random.Random(6)
    hs = sorted(
        {1, 2, 3, (1 << 47) - 1, 1 << 47, (1 << 48) - 1, 1 << 48}
        | {rng.randrange(1, 1 << 48) for _ in range(400)}
    )
    ref = {h: _log2fp_reference(h, LOG2FP_FRAC_BITS) for h in hs}
    # accuracy + monotonicity of the spec itself
    for h, v in ref.items():
        assert abs(v / (1 << LOG2FP_FRAC_BITS) - math.log2(h)) < 3e-6
    vals = [ref[h] for h in hs]
    assert all(a <= b for a, b in zip(vals, vals[1:]))

    df = spark.createDataFrame([(h,) for h in hs], "h long")
    got = {
        r["h"]: r["l2"]
        for r in with_log2fp(df.repartition(7), "h", "l2").collect()
    }
    assert got == ref  # Spark rendering == executable spec, any partitioning

    sql = (
        "WITH "
        + log2fp_sql(
            "SELECT h AS key, h FROM (SELECT unnest(["
            + ",".join(str(h) for h in hs)
            + "]) AS h)"
        )
        + " SELECT key, l2fp FROM l2fin ORDER BY key"
    )
    duck = dict(duckdb.sql(sql).fetchall())
    assert duck == ref  # DuckDB rendering == executable spec


def test_log2fp_rejects_reserved_columns(spark):
    import pytest

    from kafka_clickhouse_example_spark.operators.sampling import with_log2fp

    df = spark.createDataFrame([(5, 1)], "h long, _l2_t long")
    with pytest.raises(ValueError, match="reserved"):
        with_log2fp(df, "h", "out")


def test_log2fp_many_interleaved_equals_single_chains(spark):
    import random

    from kafka_clickhouse_example_spark.operators.sampling import (
        with_log2fp,
        with_log2fp_many,
    )

    rng = random.Random(7)
    rows = [
        (rng.randrange(1, 1 << 48), rng.randrange(1, 1 << 48), rng.randrange(1, 1 << 48))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    many = {
        (r["a"], r["b"], r["c"]): (r["la"], r["lb"], r["lc"])
        for r in with_log2fp_many(
            df, [("a", "la"), ("b", "lb"), ("c", "lc")]
        ).collect()
    }
    single = with_log2fp(with_log2fp(with_log2fp(df, "a", "la"), "b", "lb"), "c", "lc")
    ref = {
        (r["a"], r["b"], r["c"]): (r["la"], r["lb"], r["lc"])
        for r in single.collect()
    }
    # interleaving is a build-time grouping, never a value change
    assert many == ref


def test_log2fp_many_rejects_duplicate_outputs(spark):
    import pytest

    from kafka_clickhouse_example_spark.operators.sampling import with_log2fp_many

    df = spark.createDataFrame([(5, 6)], "a long, b long")
    with pytest.raises(ValueError):
        with_log2fp_many(df, [("a", "out"), ("b", "out")])


def test_kl_query_negative_numerator_matches_oracle(spark, tmp_path):
    """The one input region where engine division conventions could
    diverge: proportional source/corpus distributions (true KL = 0) drive
    the quantized numerator NEGATIVE (log2fp floors), so the final
    division must round the same way in Spark and DuckDB. Spark `div` and
    DuckDB integer `//` both truncate toward zero; a floor on either side
    would yield -1 vs 0 here."""
    import duckdb

    import __spark_entry__ as entry

    # source A: 2x + 3y, source B: 4x + 6y -> identical distributions;
    # quantized numerators are -3 (A) and -6 (B) under the Q20 spec.
    df = spark.createDataFrame(
        [(1, "A", "x x y y y"), (2, "B", "x x x x y y y y y y")],
        "doc_id long, source string, text string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    num = {}
    for counts, n in (((2, 3), 5), ((4, 6), 10)):
        num[n] = sum(
            c * ((_log2fp_reference(c) - _log2fp_reference(n))
                 - (_log2fp_reference(m) - _log2fp_reference(15)))
            for c, m in zip(counts, (6, 9))
        )
    assert num[5] < 0 and num[10] < 0  # the corner is actually exercised

    got = {
        r["source"]: (r["n_tokens"], r["kl_q20"])
        for r in entry.queries()["text_token_kl_by_source"](
            spark, str(tmp_path)
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            entry.oracle_sql()["text_token_kl_by_source"]
        ).fetchall()
    }
    assert got == oracle
    # truncation toward zero: |numerator| < n_tokens -> exactly 0, not -1
    assert got == {"A": (5, 0), "B": (10, 0)}


def test_log2fp_properties_hypothesis():
    """Property-pin the executable spec itself (no Spark needed): weak
    monotonicity, the documented ~3-ulp accuracy bound, and exactness on
    powers of two (mantissa stays exactly 2^30 through every squaring, so
    the fraction is all zeros)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=1, max_value=1 << 48),
        st.integers(min_value=1, max_value=1 << 48),
    )
    def check(a, b):
        la, lb = _log2fp_reference(a), _log2fp_reference(b)
        if a <= b:
            assert la <= lb
        else:
            assert la >= lb
        assert abs(la / (1 << 20) - math.log2(a)) < 3e-6

    check()
    for k in range(49):
        assert _log2fp_reference(1 << k) == k << 20
