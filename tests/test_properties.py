"""Property-based parity for the two kernels every oracle depends on:
md5 hash bucketing (sampling/splits) and tokenization (dedup/text).

Each example ships a BATCH of generated values through one Spark job and
compares against independent pure-Python references — the cross-engine
contract is exercised on arbitrary inputs, not just the checked fixtures.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.sampling import SPLIT_BUCKETS, hash_bucket
from kafka_clickhouse_example_spark.operators.text import tokens

# Java/RE2 \s — ASCII whitespace only (the round-2 parity rule).
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _ref_bucket(key: str) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:14], 16) % SPLIT_BUCKETS


def _ref_tokens(text: str) -> list[str]:
    return _WS.split(text.strip(" "))


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=40, unique=True))
def test_hash_bucket_matches_python_md5(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", hash_bucket(F.col("k")).alias("b")).collect()
    }
    assert got == {k: _ref_bucket(str(k)) for k in keys}


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"  # Spark strings are NUL-hostile
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_tokenizer_matches_ascii_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens(F.col("t")).alias("toks")).collect()
    }
    assert got == {i: _ref_tokens(t) for i, t in rows}
