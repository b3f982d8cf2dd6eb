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
    Identical to DuckDB's ('0x' || substr(md5(t),1,15))::BIGINT.
    """
    from kafka_clickhouse_example_spark.operators.sampling import md5_prefix_long

    return md5_prefix_long(tok, 15)


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


def grams_from_tokens(toks: Column, n: int) -> Column:
    """ALL word n-grams (duplicates kept, unlike dedup's distinct shingles)
    from a materialized token-array column; empty array below n tokens."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def with_repetition_metrics(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher/C4-style repetition and shape filters, per document.

    The published quality-filter families (Gopher rules, C4 heuristics)
    score a document by how much of it is the same thing repeated: the
    fraction of mass in the single most frequent token, the fraction of
    duplicate n-grams, degenerate token lengths, symbol density. Documents
    past the thresholds are boilerplate/spam with high probability and get
    dropped before training.

    Plan shape: one narrow pass computes every per-row metric from a
    materialized token array (arrays built once per row — HOFs are
    interpreted, so each intermediate gets its own Project); the only wide
    operation is the top-token count, which is the canonical two-level
    aggregate (explode -> count by (doc, token) -> max by doc, partial
    aggregation map-side) joined back on doc_id. At 100 TB both sides of
    that join are already hash-partitioned by doc_id, so the join reuses
    the aggregation exchange.

    All ratios are single-path count/count double divisions —
    bit-identical in the DuckDB oracle.
    """
    t = F.col(text_col)
    base = (
        df.select(F.col(id_col).alias("doc_id"), t.alias("_text"))
        .withColumn("_toks", tokens(F.col("_text")))
        .withColumn("_g2", grams_from_tokens(F.col("_toks"), 2))
        .withColumn("_g3", grams_from_tokens(F.col("_toks"), 3))
        .withColumn("_lens", F.transform(F.col("_toks"), F.length))
    )
    n_tok = F.size("_toks").cast("long")
    per_doc = base.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("_toks")).cast("double") / n_tok.cast("double")
        ).alias("frac_dup_tokens"),
        F.when(
            F.size("_g2") > 0,
            F.lit(1.0)
            - F.size(F.array_distinct("_g2")).cast("double")
            / F.size("_g2").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("frac_dup_2grams"),
        F.when(
            F.size("_g3") > 0,
            F.lit(1.0)
            - F.size(F.array_distinct("_g3")).cast("double")
            / F.size("_g3").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("frac_dup_3grams"),
        (
            F.aggregate(
                F.col("_lens"), F.lit(0).cast("long"), lambda acc, x: acc + x
            ).cast("double")
            / n_tok.cast("double")
        ).alias("mean_token_len"),
        (
            F.length(F.regexp_replace(F.col("_text"), "[A-Za-z0-9 ]", "")).cast(
                "double"
            )
            / F.length("_text").cast("double")
        ).alias("symbol_ratio"),
    )
    top = (
        base.select("doc_id", F.explode("_toks").alias("_tok"))
        .groupBy("doc_id", "_tok")
        .agg(F.count("*").alias("_cnt"))
        .groupBy("doc_id")
        .agg(F.max("_cnt").alias("_top_cnt"))
    )
    # shuffle_hash hint: both sides are O(docs); Spark's size estimate would
    # broadcast the aggregated top-token side, which does not survive scale.
    # The hash join repartitions both sides by doc_id and the top side
    # reuses its aggregation exchange.
    return (
        per_doc.join(top.hint("shuffle_hash"), "doc_id")
        .withColumn(
            "frac_top_token",
            F.col("_top_cnt").cast("double") / F.col("n_tokens").cast("double"),
        )
        .drop("_top_cnt")
        .withColumn(
            "keep",
            (F.col("n_tokens") >= 10)
            & (F.col("n_tokens") <= 100000)
            & (F.col("frac_top_token") <= 0.125)
            & (F.col("frac_dup_2grams") <= 0.05)
            & (F.col("mean_token_len") >= 3.0)
            & (F.col("mean_token_len") <= 10.0),
        )
    )


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


def compression_ratio_udf():
    """Arrow pandas UDF: zlib-compressed length of the UTF-8 text.

    Compression ratio (compressed/raw) is the classic cheap
    repetitiveness signal — boilerplate and looped spam compress far
    below natural prose. Not expressible as column SQL (byte-level DEFLATE);
    an Arrow batch UDF keeps the transfer vectorized. zlib level is
    pinned so output is deterministic across runs and platforms (DEFLATE
    output for a fixed level/dictionary is stable in CPython's zlib).
    """
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _compressed_len(text):
        return text.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6)) if t is not None else None
        )

    # Real annotation objects: this module's `from __future__ import
    # annotations` would stringify inline hints, and pandas_udf cannot
    # resolve 'pd.Series' from a function-local import.
    _compressed_len.__annotations__ = {"text": pd.Series, "return": pd.Series}
    return pandas_udf(_compressed_len, "long")


# --- markup stripping + unicode normalization (corpus cleaning) -----------

MARKUP_TAG_RE = r"<[^>]+>"
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&")]
# &amp; decodes LAST: decoding it first would create new '&lt;'-style
# sequences from literal '&amp;lt;' input (double-decode bug).


def strip_markup(col: Column) -> Column:
    """Drop HTML/XML tags (replaced by a space so adjacent words don't
    fuse) and decode the four basic character entities. Pure JVM regex /
    string ops — whole-stage codegen, no Python."""
    out = F.regexp_replace(col, MARKUP_TAG_RE, " ")
    for entity, ch in _ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(ch))
    return out


def collapse_whitespace(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def nfc_normalize_udf():
    """Arrow-batched NFC unicode normalization (composes e+COMBINING ACUTE
    into é, etc.). Spark has no built-in normalizer, so this is one of the
    engine's few sanctioned Python boundaries — vectorized per batch, pure
    stdlib on the workers."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(text):
        return text.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    _nfc.__annotations__ = {"text": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc, "string")


def clean_text_expr(col: Column) -> Column:
    """The full cleaning ladder: strip markup -> decode entities ->
    collapse whitespace (all JVM) -> NFC normalize (one Arrow pass)."""
    return nfc_normalize_udf()(collapse_whitespace(strip_markup(col)))


# --- mergeable token-count state + entropy serving ---------------------------


def token_counts(df, source_col: str = "source", text_col: str = "text"):
    """(source, term, n) whitespace-token counts — the mergeable state
    every token-distribution diagnostic (entropy, KL, TTR) derives from.
    Counts are ADDITIVE across any corpus split, so the same relation can
    be built batch (one partial-agg shuffle) or maintained incrementally
    from per-batch partials (sinks/backfill.start_token_count_matview)
    with bit-identical downstream metrics. Empty tokens are dropped
    (split of all-whitespace text yields '').

    Scale: explode fan-out is absorbed by map-side combine; the shuffled
    relation is sources x vocab, orders of magnitude below token count.
    """
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("source", "term").agg(F.count("*").alias("n"))


def token_entropy_from_counts(cnt):
    """Per-source Shannon entropy in Q20 fixed point from (source, term,
    n) counts: H = (1/N)*sum n_i*(L(N)-L(n_i)) with L the cross-engine
    integer log2 (operators/sampling.with_log2fp_many). Serving this from
    an incrementally-maintained counts table produces the same bits as a
    batch rebuild over the full corpus — counts are the sufficient
    statistic, and everything after them is deterministic integer math
    (pinned by tests against the registered batch query).

    The per-term summand n_i*(L(N)-L(n_i)) is non-negative (L is weakly
    monotone and n_i <= N), so truncating and floor division agree here;
    int64 bound: any single token type beyond ~1.8e11 occurrences per
    source needs DECIMAL promotion of the product.
    """
    from kafka_clickhouse_example_spark.operators import sampling as SP

    tot = cnt.groupBy("source").agg(
        F.sum("n").alias("n_tokens"), F.count("*").alias("n_types")
    )
    j = cnt.join(F.broadcast(tot), "source")
    j = SP.with_log2fp_many(j, [("n", "l2_n"), ("n_tokens", "l2_tot")])
    contrib = F.expr("(n * (l2_tot - l2_n)) div n_tokens")
    ent = (
        j.withColumn("_contrib", contrib)
        .groupBy("source", "n_tokens", "n_types")
        .agg(F.sum("_contrib").cast("long").alias("entropy_q20"))
    )
    return ent.select(
        "source",
        "n_tokens",
        "n_types",
        "entropy_q20",
        (F.col("entropy_q20").cast("double") / F.lit(float(1 << 20))).alias(
            "entropy_bits"
        ),
    ).orderBy("source")


def token_kl_from_counts(cnt):
    """Per-source KL divergence vs the corpus mix in Q20 fixed point from
    (source, term, n) counts — see queries_text.text_token_kl_by_source
    for the metric derivation and the engine-division convention (the
    summed numerator can be negative; Spark `div` and DuckDB integer `//`
    both truncate toward zero). Counts are the sufficient statistic, so
    serving from the maintained matview matches the batch rebuild
    bit-for-bit.
    """
    from kafka_clickhouse_example_spark.operators import sampling as SP

    tot = cnt.groupBy("source").agg(F.sum("n").alias("n_tokens"))
    vocab = cnt.groupBy("term").agg(F.sum("n").alias("m"))
    grand = cnt.agg(F.sum("n").alias("big_m"))
    # The vocab join is deliberately UNHINTED — audited against the
    # round-10 broadcast-valley finding and cleared: the hazard needs the
    # REAL relation to outgrow the driver caps while the size ESTIMATE
    # stays under the 64 MB threshold (real/estimate > ~16-128x, which
    # shingle ARRAYS hit via per-candidate expansion). The vocabulary is
    # the opposite shape: a skinny (term, m) SUB-linear aggregate whose
    # estimate derives from the corpus scan bytes — by the time the
    # vocabulary approaches any cap, the scan estimate is TBs over the
    # threshold, so Catalyst broadcasts only while it genuinely fits
    # (measured 1.3 s here vs 3.3 s pinned-SHJ / 3.5 s window-over-term
    # at sf0.1 — the broadcast is the right local plan too).
    j = (
        cnt.join(F.broadcast(tot), "source")
        .join(vocab, "term")
        .crossJoin(F.broadcast(grand))
    )
    j = SP.with_log2fp_many(
        j,
        [("n", "l2_n"), ("n_tokens", "l2_tot"), ("m", "l2_m"), ("big_m", "l2_gm")],
    )
    num = F.sum(
        F.col("n")
        * ((F.col("l2_n") - F.col("l2_tot")) - (F.col("l2_m") - F.col("l2_gm")))
    ).cast("long")
    agg = j.groupBy("source", "n_tokens").agg(num.alias("_num"))
    kl = F.expr("_num div n_tokens")
    return (
        agg.withColumn("kl_q20", kl.cast("long"))
        .select(
            "source",
            "n_tokens",
            "kl_q20",
            (F.col("kl_q20").cast("double") / F.lit(float(1 << 20))).alias("kl_bits"),
        )
        .orderBy("source")
    )
