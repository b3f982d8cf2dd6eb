"""Text-analysis operators for training-data pipelines (driver extension
mandate, BASELINE.json): token counting, quality scoring, language ID,
document fingerprinting.

Everything here is pure column expressions — JVM-side, inside whole-stage
codegen, no Python in the hot path. At 100 TB these run as narrow map stages
over the documents table with zero shuffles; the only wide operation any
caller adds is its own aggregation.

Determinism: token hashing uses md5 (bit-identical everywhere) folded with a
fixed polynomial, NOT xxhash/murmur whose seeds/variants differ across
engines. That makes every fingerprint reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword sets per language for the n-gram/stopword heuristic.
# Deterministic and mirrored verbatim in oracle SQL — not a linguistics claim.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "los", "las", "y", "es", "uno", "una", "en"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}
# Fixed priority order for argmax tie-breaking (first wins on >=).
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]

FINGERPRINT_MOD = 1_000_000_007


def tokens(text: Column) -> Column:
    """Whitespace tokenization: split(trim(text), r'\\s+')."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbols
# — the coarse split BPE vocabularies apply before merges. Supported
# identically by Spark's and DuckDB's regex engines (no lookarounds).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    """array<string> of BPE-style word pieces (regexp_extract_all)."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def stopword_count(text: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def alpha_char_count(text: Column) -> Column:
    """Number of ASCII-alphabetic characters."""
    return F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))


def token_hash(tok: Column) -> Column:
    """Deterministic 60-bit token hash: first 15 hex chars of md5.

    conv(hex,16,10) -> decimal string -> long. Identical to DuckDB's
    ('0x' || substr(md5(t),1,15))::BIGINT.
    """
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")


def doc_fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over token hashes:
    fold(acc*31 + h(tok)) mod 1e9+7 — an order-sensitive document signature
    (re-ordered tokens fingerprint differently, unlike a bag-of-words hash).
    """
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + token_hash(t)) % F.lit(FINGERPRINT_MOD),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, words) for lang, words in STOPWORDS.items()}


def lang_ladder(scores: dict[str, Column]) -> Column:
    """Stopword-count argmax with fixed priority tie-break (en>de>fr>es>zh),
    as a CASE ladder over *already-materialized* score columns.

    The ladder references each score up to |langs|-1 times; passing raw
    ``stopword_count`` expressions here would re-split the text per
    reference (interpreted, no CSE — see operators/dedup.py docstring).
    """
    expr = F.lit(LANG_PRIORITY[-1])
    # Build the ladder bottom-up: es>=zh -> es, else zh; then fr>=both, ...
    for i in range(len(LANG_PRIORITY) - 2, -1, -1):
        lang = LANG_PRIORITY[i]
        cond = None
        for later in LANG_PRIORITY[i + 1 :]:
            c = scores[lang] >= scores[later]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def with_lang_id(df, text_col: str = "text", out: str = "predicted_lang"):
    """Materialize per-language stopword counts (one tokenization), then the
    argmax ladder over the count columns."""
    toks = tokens(F.col(text_col))
    scored = df.withColumn("_lt", toks)
    for lang, words in STOPWORDS.items():
        scored = scored.withColumn(
            f"_ls_{lang}", F.size(F.filter(F.col("_lt"), lambda t: t.isin(*words)))
        )
    scores = {lang: F.col(f"_ls_{lang}") for lang in STOPWORDS}
    return scored.withColumn(out, lang_ladder(scores)).drop(
        "_lt", *[f"_ls_{lang}" for lang in STOPWORDS]
    )


def lang_id(text: Column) -> Column:
    """Single-expression language ID (convenience; re-tokenizes per score —
    prefer ``with_lang_id`` in hot paths)."""
    return lang_ladder(lang_scores(text))


def quality_metrics(text: Column) -> dict[str, Column]:
    """Length/alpha/stopword-based quality heuristics.

    All double math is single-path IEEE (ratio = count/count), so results are
    bit-identical across engines.
    """
    n_tokens = token_count(text)
    n_chars = F.length(text)
    n_alpha = alpha_char_count(text)
    n_stop = stopword_count(text, STOPWORDS["en"])
    alpha_ratio = n_alpha.cast("double") / n_chars.cast("double")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "n_alpha": n_alpha,
        "n_stopwords": n_stop,
        "alpha_ratio": alpha_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def with_quality_metrics(df, text_col: str = "text"):
    """Materialized quality metrics: one tokenization/regex pass per input
    row, ratios and score computed from the count *columns*."""
    t = F.col(text_col)
    out = (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_chars", F.length(t))
        .withColumn("n_alpha", alpha_char_count(t))
        .withColumn("n_stopwords", stopword_count(t, STOPWORDS["en"]))
        .withColumn(
            "alpha_ratio", F.col("n_alpha").cast("double") / F.col("n_chars").cast("double")
        )
        .withColumn(
            "stopword_ratio",
            F.col("n_stopwords").cast("double") / F.col("n_tokens").cast("double"),
        )
    )
    return out.withColumn(
        "quality_score",
        F.lit(0.4) * F.col("alpha_ratio")
        + F.lit(0.4) * F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
        + F.lit(0.2) * F.least(F.col("n_tokens").cast("double") / 100, F.lit(1.0)),
    )
