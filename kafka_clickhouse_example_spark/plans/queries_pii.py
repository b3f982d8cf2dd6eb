"""PII scrub queries over the documents table, with DuckDB oracles.

The synthetic corpus contains no natural PII, so each query first DERIVES a
deterministic PII-bearing text column from (doc_id, text) — the same
injection expression in Spark and in the oracle SQL — then runs the
operators/pii.py scrubber on it. The injection covers every pattern kind
(email, phone, SSN, IPv4, valid card, Luhn-invalid card) at different
doc_id moduli so counts vary per document and redaction order is exercised.
A hash match therefore certifies the scan counts, the Luhn filter, and the
bit-exact redacted text (via md5) cross-engine — not just plumbing.

Scale (100 TB): everything here is a map-only projection over the corpus
(regex DFAs in whole-stage codegen, no shuffle except the final per-source
rollup, which aggregates to #sources rows with map-side partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import pii as P
from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

_PAT = {kind: pat for kind, pat, _ in P.PII_PATTERNS}

# A universally-published Luhn-valid test number and an invalid twin.
VALID_CARD = "4111 1111 1111 1111"
INVALID_CARD = "4111 1111 1111 1112"


def _injected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus a ``pii_text`` column with deterministic injected PII."""
    configure_runtime(spark)
    docs = load_compute_table(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def when_mod(m: int, col: Column) -> Column:
        return F.when(did % m == 0, col).otherwise(F.lit(""))

    pii_text = F.concat(
        F.col("text"),
        when_mod(3, F.concat(F.lit(" contact p"), did.cast("string"), F.lit("@example.com"))),
        when_mod(4, F.concat(F.lit(" call +1 555-010-"), F.lpad((did % 10000).cast("string"), 4, "0"))),
        when_mod(5, F.concat(F.lit(" host 192.168."), (did % 256).cast("string"), F.lit("."), ((did * 7) % 256).cast("string"))),
        when_mod(7, F.concat(F.lit(" ssn 078-05-"), F.lpad((did % 10000).cast("string"), 4, "0"))),
        when_mod(11, F.lit(" card " + VALID_CARD)),
        when_mod(13, F.lit(" card " + INVALID_CARD)),
    )
    return docs.withColumn("pii_text", pii_text)


# The identical injection in DuckDB SQL (|| concat, CASE guards).
INJECT_SQL = """
text
|| CASE WHEN doc_id % 3 = 0 THEN ' contact p' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
|| CASE WHEN doc_id % 4 = 0 THEN ' call +1 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
|| CASE WHEN doc_id % 5 = 0 THEN ' host 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
|| CASE WHEN doc_id % 7 = 0 THEN ' ssn 078-05-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
|| CASE WHEN doc_id % 11 = 0 THEN ' card {valid}' ELSE '' END
|| CASE WHEN doc_id % 13 = 0 THEN ' card {invalid}' ELSE '' END
""".replace("{valid}", VALID_CARD).replace("{invalid}", INVALID_CARD).strip()

# Luhn over a matched card string x (exactly 16 digits after stripping):
# double digits at odd 1-based-from-left positions (= every second from the
# right), subtract 9 when > 9, sum mod 10 == 0. Mirrors operators/pii.py's
# reversed-index column expression for the fixed 16-digit case.
_LUHN_SQL = (
    "list_sum(list_transform(range(1, 17), i -> CASE WHEN (16 - i) % 2 = 1 "
    "THEN CASE WHEN CAST(substr(regexp_replace(x, '[^0-9]', '', 'g'), i, 1) AS INT) * 2 > 9 "
    "THEN CAST(substr(regexp_replace(x, '[^0-9]', '', 'g'), i, 1) AS INT) * 2 - 9 "
    "ELSE CAST(substr(regexp_replace(x, '[^0-9]', '', 'g'), i, 1) AS INT) * 2 END "
    "ELSE CAST(substr(regexp_replace(x, '[^0-9]', '', 'g'), i, 1) AS INT) END)) % 10 = 0"
)


def _redact_sql(col: str) -> str:
    out = col
    for _, pat, placeholder in P.PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{placeholder}', 'g')"
    return out


@register(
    "text_pii_scan",
    oracle=f"""
WITH injected AS (SELECT doc_id, {INJECT_SQL} AS pii_text FROM documents)
SELECT
  doc_id,
  CAST(len(regexp_extract_all(pii_text, '{_PAT["email"]}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(pii_text, '{_PAT["phone"]}')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(pii_text, '{_PAT["ssn"]}'))   AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(pii_text, '{_PAT["ipv4"]}'))  AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(pii_text, '{_PAT["cc"]}'))    AS BIGINT) AS n_cc,
  CAST(len(list_filter(regexp_extract_all(pii_text, '{_PAT["cc"]}'),
                       x -> {_LUHN_SQL})) AS BIGINT)                   AS n_cc_valid,
  CAST(len(regexp_extract_all(pii_text, '{_PAT["email"]}'))
     + len(regexp_extract_all(pii_text, '{_PAT["phone"]}'))
     + len(regexp_extract_all(pii_text, '{_PAT["ssn"]}'))
     + len(regexp_extract_all(pii_text, '{_PAT["ipv4"]}'))
     + len(regexp_extract_all(pii_text, '{_PAT["cc"]}')) AS BIGINT)   AS n_pii
FROM injected
ORDER BY doc_id
""",
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII match counts by kind, plus a Luhn-validated card
    count (n_cc counts digit-shaped matches; n_cc_valid only checksum-valid
    ones — the injected invalid twin keeps the two columns distinct)."""
    docs = _injected(spark, sf_dir)
    text = F.col("pii_text")
    counts = P.pii_counts(text)
    total = None
    for name in counts:
        total = counts[name] if total is None else total + counts[name]
    cc_valid = F.size(
        F.filter(
            F.regexp_extract_all(text, F.lit(_PAT["cc"]), F.lit(0)), P.luhn_valid
        )
    )
    return docs.select(
        "doc_id",
        *[counts[f"n_{k}"].cast("bigint").alias(f"n_{k}") for k in ["email", "phone", "ssn", "ipv4", "cc"]],
        cc_valid.cast("bigint").alias("n_cc_valid"),
        total.cast("bigint").alias("n_pii"),
    ).orderBy("doc_id")


@register(
    "text_pii_redact",
    oracle=f"""
WITH injected AS (SELECT doc_id, {INJECT_SQL} AS pii_text FROM documents)
SELECT
  doc_id,
  CAST(length(pii_text) AS BIGINT)                 AS len_before,
  CAST(length({_redact_sql("pii_text")}) AS BIGINT) AS len_after,
  md5({_redact_sql("pii_text")})                   AS redacted_md5
FROM injected
ORDER BY doc_id
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction certified bit-exact: md5 of the scrubbed text must match
    the oracle's, so replacement order, placeholders, and every pattern's
    match spans are identical cross-engine."""
    docs = _injected(spark, sf_dir)
    red = P.redact_expr(F.col("pii_text"))
    return docs.select(
        "doc_id",
        F.length("pii_text").cast("bigint").alias("len_before"),
        F.length(red).cast("bigint").alias("len_after"),
        F.md5(red.cast("binary")).alias("redacted_md5"),
    ).orderBy("doc_id")


@register(
    "text_pii_rate_by_source",
    oracle=f"""
WITH injected AS (SELECT doc_id, source, {INJECT_SQL} AS pii_text FROM documents),
scanned AS (
  SELECT source,
         len(regexp_extract_all(pii_text, '{_PAT["email"]}'))
       + len(regexp_extract_all(pii_text, '{_PAT["phone"]}'))
       + len(regexp_extract_all(pii_text, '{_PAT["ssn"]}'))
       + len(regexp_extract_all(pii_text, '{_PAT["ipv4"]}'))
       + len(regexp_extract_all(pii_text, '{_PAT["cc"]}')) AS n_pii
  FROM injected)
SELECT source,
       CAST(count(*) AS BIGINT)                    AS n_docs,
       CAST(count(*) FILTER (WHERE n_pii > 0) AS BIGINT) AS docs_with_pii,
       CAST(sum(n_pii) AS BIGINT)                  AS total_matches,
       round(CAST(sum(n_pii) AS DOUBLE) / count(*), 4) AS pii_per_doc
FROM scanned
GROUP BY source
ORDER BY source
""",
)
def text_pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incidence — the release-gate report a corpus curator
    reads before shipping. Map-only scan then a #sources-row rollup."""
    docs = _injected(spark, sf_dir)
    counts = P.pii_counts(F.col("pii_text"))
    total = None
    for name in counts:
        total = counts[name] if total is None else total + counts[name]
    return (
        docs.select("source", total.alias("n_pii"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_if(F.col("n_pii") > 0).cast("bigint").alias("docs_with_pii"),
            F.sum("n_pii").cast("bigint").alias("total_matches"),
            F.round(F.sum("n_pii").cast("double") / F.count("*"), 4).alias("pii_per_doc"),
        )
        .orderBy("source")
    )


K_ANONYMITY = 5
BUCKET = 100  # n_chars quasi-identifier coarsening


@register(
    "privacy_k_anonymity_audit",
    oracle=f"""
WITH cells AS (
  SELECT lang, source, n_chars // {BUCKET} AS len_bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source, len_bucket
)
SELECT lang,
       CAST(count(*) AS BIGINT)                                   AS n_cells,
       CAST(count(*) FILTER (WHERE n < {K_ANONYMITY}) AS BIGINT)  AS risky_cells,
       CAST(coalesce(sum(n) FILTER (WHERE n < {K_ANONYMITY}), 0) AS BIGINT) AS risky_docs,
       CAST(min(n) AS BIGINT)                                     AS min_cell_size
FROM cells GROUP BY lang
ORDER BY lang
""",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier cell (lang, source,
    coarsened length): cells smaller than k=5 mark documents
    re-identifiable by metadata alone even after text redaction — the
    release check that complements the content-level PII scrub.

    Scale: one groupBy to the quasi-identifier cells (bounded by the
    attribute cross-product, not row count), then a #langs-row rollup.
    """
    configure_runtime(spark)
    docs = load_compute_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        "lang", "source", F.expr(f"n_chars div {BUCKET}").alias("len_bucket")
    ).agg(F.count("*").cast("bigint").alias("n"))
    risky = F.col("n") < K_ANONYMITY
    return (
        cells.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.count_if(risky).cast("bigint").alias("risky_cells"),
            F.coalesce(F.sum(F.when(risky, F.col("n"))), F.lit(0))
            .cast("bigint")
            .alias("risky_docs"),
            F.min("n").cast("bigint").alias("min_cell_size"),
        )
        .orderBy("lang")
    )
