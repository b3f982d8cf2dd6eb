"""Cleaning-ladder unit tests: entity decode order, NFC composition, and
markup handling (the oracle query certifies the composition end-to-end;
these pin the edge semantics)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import text as T


def _clean(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(T.clean_text_expr(F.col("text")).alias("c")).collect()[0].c


def test_no_double_entity_decode(spark):
    # literal '&amp;lt;' means the five characters '&lt;' — decoding &amp;
    # first and then &lt; would wrongly produce '<'
    assert _clean(spark, "a &amp;lt; b") == "a &lt; b"


def test_nfc_composes_combining_marks(spark):
    nfd = "Cafe\u0301"  # explicit decomposed form, 5 code points
    assert not unicodedata.is_normalized("NFC", nfd)
    out = _clean(spark, nfd)
    assert out == "Caf\u00e9"
    assert len(out) == 4
    assert unicodedata.is_normalized("NFC", out)


def test_tags_stripped_words_not_fused(spark):
    assert _clean(spark, "one<br>two <b>three</b>") == "one two three"


def test_whitespace_collapsed_and_trimmed(spark):
    assert _clean(spark, "  a \t\n b  ") == "a b"
