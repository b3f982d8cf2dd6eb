"""PII detection and redaction over text columns.

A training-data pipeline has to find and scrub personally identifiable
information before corpus release. This module implements the standard
regex-family scrubber as pure JVM-side column expressions — every pattern
is evaluated by Catalyst's ``regexp_count`` / ``regexp_replace`` inside
whole-stage codegen, so the scan is a map-only pass over the corpus with
no shuffle and no Python boundary.

Pattern dialect contract: every pattern lives in the **common subset of
Java regex (Spark) and RE2 (DuckDB)** — no backreferences, no lookaround —
so the exact same pattern string drives the engine and the DuckDB oracle,
and redacted output is certified bit-identical cross-engine (md5 of the
redacted text, see plans/queries_pii.py).

Scale (100 TB): O(bytes) map-only scan; each pattern is a compiled DFA run
once per row. Redaction order is significant and fixed (email → card →
SSN → phone → IPv4) so a credit card is never half-eaten by the phone
pattern; the order is part of the operator contract, not an accident.

Luhn validation (credit-card checksum) is a pure column expression over
``filter``/``transform``/``aggregate`` higher-order functions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, placeholder) — order is the redaction order.
# Patterns: Java-regex ∩ RE2 (no backreferences / lookaround).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("cc", r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b", "[CARD]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\+[0-9]{1,2}[ .-][0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}", "[PHONE]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts for ``text`` — one ``n_<kind>`` column each.

    Counts run against the RAW text (before redaction); the pattern set is
    designed non-overlapping on well-formed inputs, so counts are
    order-independent even though redaction is not.
    """
    return {
        f"n_{kind}": F.regexp_count(text, F.lit(pat))
        for kind, pat, _ in PII_PATTERNS
    }


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_email .. n_ipv4`` and ``n_pii`` (total) count columns."""
    counts = pii_counts(F.col(text_col))
    out = df
    for name, col in counts.items():
        out = out.withColumn(name, col)
    total = None
    for name in counts:
        total = F.col(name) if total is None else total + F.col(name)
    return out.withColumn("n_pii", total)


def redact_expr(text: Column) -> Column:
    """The redacted text: chained ``regexp_replace`` in PII_PATTERNS order."""
    out = text
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def pii_redact(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Append ``out_col`` holding the scrubbed text."""
    return df.withColumn(out_col, redact_expr(F.col(text_col)))


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum validity of a card number given as a digit string
    (separators allowed — they are stripped first).

    Pure column expression: strip non-digits, reverse so position parity is
    anchored at the check digit, double every second digit (subtracting 9
    when the doubled value exceeds 9), and check the sum mod 10. Runs in
    whole-stage codegen; used to drop regex matches that are digit-shaped
    but not actual card numbers (false-positive control on the cc pattern).
    """
    ds = F.regexp_replace(digits, r"[^0-9]", "")
    rev = F.reverse(ds)
    chars = F.filter(F.split(rev, ""), lambda c: c != F.lit(""))
    vals = F.transform(
        chars,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9).otherwise(
                c.cast("int") * 2
            ),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return (F.length(ds) >= F.lit(12)) & (total % 10 == 0)
