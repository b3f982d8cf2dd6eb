"""Unit tests for operators/pii.py: Luhn checksum, pattern coverage, and
redaction-order guarantees (beyond what the oracle-parity queries certify)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import pii as P


def _one(spark, text: str):
    return spark.createDataFrame([(text,)], "text string")


def test_luhn_valid_known_numbers(spark):
    rows = [
        ("4111 1111 1111 1111", True),   # published Visa test number
        ("4111-1111-1111-1112", False),  # check digit off by one
        ("5500 0000 0000 0004", True),   # published MC test number
        ("1234 5678 9012 3456", False),
        ("12", False),                   # too short to be a PAN at all
    ]
    df = spark.createDataFrame(rows, "cc string, expected boolean")
    got = df.select("expected", P.luhn_valid(F.col("cc")).alias("got")).collect()
    for r in got:
        assert r.got == r.expected


def test_scan_counts_each_kind(spark):
    text = (
        "mail a@b.co and c.d+x@e-f.org, call +1 555-010-1234, "
        "ssn 078-05-1120, host 10.0.0.1, card 4111 1111 1111 1111"
    )
    row = P.pii_scan(_one(spark, text)).collect()[0]
    assert (row.n_email, row.n_phone, row.n_ssn, row.n_ipv4, row.n_cc) == (2, 1, 1, 1, 1)
    assert row.n_pii == 6


def test_redaction_order_card_before_phone(spark):
    # A dash-separated card must be eaten whole by [CARD]; if the phone or
    # SSN pattern ran first it would bite chunks out of the middle.
    text = "pay 4111-1111-1111-1111 now"
    red = _one(spark, text).select(P.redact_expr(F.col("text")).alias("r")).collect()[0].r
    assert red == "pay [CARD] now"


def test_redaction_replaces_all_kinds(spark):
    text = "a@b.co +1 555-010-1234 078-05-1120 10.0.0.1 4111 1111 1111 1111"
    red = _one(spark, text).select(P.redact_expr(F.col("text")).alias("r")).collect()[0].r
    assert red == "[EMAIL] [PHONE] [SSN] [IP] [CARD]"


def test_clean_text_untouched(spark):
    text = "no identifiers here, just words and the number 42"
    out = P.pii_scan(P.pii_redact(_one(spark, text))).collect()[0]
    assert out.n_pii == 0
    assert out.redacted == text
