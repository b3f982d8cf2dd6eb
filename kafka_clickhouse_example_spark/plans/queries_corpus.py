"""Corpus-preparation queries: chunking, n-gram vocabulary, per-source
gates, and embedding-space aggregates — the ops a training-data pipeline
runs between raw ingest and tokenizer/training handoff.

Determinism follows the analytics module rules: exact DECIMAL partials
wherever a sum feeds a comparison or a hash-gated output, final types
pinned on both engines, total ORDER BY everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.plans.queries_text import TOKENS_SQL, _docs
from kafka_clickhouse_example_spark.operators import text as T
from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_compute_table, load_table

CHUNK = 100
STRIDE = 80  # CHUNK - STRIDE = 20 chars of overlap between adjacent chunks


@register(
    "text_chunk_overlap",
    oracle=f"""
SELECT d.doc_id,
       CAST(pos // {STRIDE} AS BIGINT)  AS chunk_no,
       substr(d.text, pos + 1, {CHUNK}) AS chunk_text,
       length(substr(d.text, pos + 1, {CHUNK})) AS chunk_len
FROM documents d,
     LATERAL unnest(generate_series(0, greatest(length(d.text) - 1, 0),
                                    {STRIDE})) AS g(pos)
ORDER BY doc_id, chunk_no
""",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking ({CHUNK}-char windows, {STRIDE}-char
    stride): the standard pre-tokenization split for long documents, as a
    pure column plan — sequence() builds the chunk-start offsets,
    explode() fans them out, substring() slices.

    Scale: no shuffle at all — chunking is embarrassingly parallel per
    document; the explode multiplies rows ~len/stride but each output
    partition derives from exactly one input partition. The final ORDER
    BY exists for the deterministic gate only; a real pipeline would
    write chunks unsorted.
    """
    docs = _docs(spark, sf_dir)
    bound = F.greatest(F.length("text") - F.lit(1), F.lit(0))
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), bound, F.lit(STRIDE))).alias("pos"),
        )
        .select(
            "doc_id",
            (F.col("pos") / STRIDE).cast("long").alias("chunk_no"),
            F.substring(F.col("text"), F.col("pos") + 1, CHUNK).alias("chunk_text"),
            F.length(F.substring(F.col("text"), F.col("pos") + 1, CHUNK)).alias(
                "chunk_len"
            ),
        )
        .orderBy("doc_id", "chunk_no")
    )


@register(
    "text_top_bigrams_per_lang",
    oracle=f"""
WITH toks AS (SELECT lang, {TOKENS_SQL} AS a FROM documents),
bigrams AS (
  SELECT lang, unnest(list_transform(generate_series(1, len(a) - 1),
                                     i -> a[i] || ' ' || a[i + 1])) AS bigram
  FROM toks WHERE len(a) >= 2
),
counted AS (
  SELECT lang, bigram, count(*) AS cnt FROM bigrams GROUP BY lang, bigram
)
SELECT lang, bigram, cnt FROM (
  SELECT lang, bigram, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rn
  FROM counted
) WHERE rn <= 5
ORDER BY lang, cnt DESC, bigram
""",
)
def text_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 token bigrams per language: adjacent-token pairing via
    zip_with over two shifted array slices (no self-join, no window over
    the exploded rows — the pairing happens inside the row).

    Scale: explode → count is one partial-combined shuffle keyed on
    (lang, bigram); the per-lang top-k runs over the *counted* relation
    (vocabulary-sized, not corpus-sized). row_number with a bigram
    tiebreak makes the cut total-ordered.
    """
    docs = _docs(spark, sf_dir)
    a = T.tokens(F.col("text"))
    n = F.size(a)
    bigrams = F.zip_with(
        F.slice(a, 1, n - 1),
        F.slice(a, 2, n - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    counted = (
        docs.filter(n >= 2)
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "bigram", "cnt")
        .orderBy("lang", F.col("cnt").desc(), "bigram")
    )


@register(
    "text_vocab_stats_per_source",
    oracle=f"""
WITH tok AS (
  SELECT source, doc_id, unnest({TOKENS_SQL}) AS token FROM documents
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT)               AS total_tokens,
       CAST(count(DISTINCT token) AS BIGINT)  AS vocab_size,
       CAST(CAST(count(DISTINCT token) AS DOUBLE)
            / count(*) AS DOUBLE)             AS type_token_ratio
FROM tok
GROUP BY source
ORDER BY source
""",
)
def text_vocab_stats_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary statistics (doc count, token volume, distinct
    vocabulary, type-token ratio) — the first report run on any new crawl
    source.

    Scale: one explode feeding a multi-distinct aggregate; Spark plans
    the two DISTINCTs via expand + partial distinct, so the shuffle
    carries per-partition-deduped (source, token) pairs, not raw token
    instances. TTR is a single double division of two exact counts.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select("source", "doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("total_tokens"),
            F.count_distinct("token").alias("vocab_size"),
            (F.count_distinct("token").cast("double") / F.count("*"))
            .cast("double")
            .alias("type_token_ratio"),
        )
        .orderBy("source")
    )


@register(
    "quality_gate_above_source_avg",
    oracle="""
WITH stats AS (
  SELECT source AS s_source,
         sum(CAST(n_chars AS DECIMAL(18,0))) AS sum_chars,
         count(*) AS cnt
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN stats ON d.source = s_source
WHERE CAST(d.n_chars AS DECIMAL(18,0)) * cnt > sum_chars
ORDER BY d.doc_id
""",
)
def quality_gate_above_source_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality gate: keep documents longer than their source's
    average length. The per-group threshold is decorrelated into one
    aggregate + broadcast rejoin, and the comparison is EXACT integer
    math (n_chars·cnt > sum_chars) — no double average whose last bits
    depend on partial-aggregation order.

    Scale: the stats side is |sources|-sized (broadcast); the gate is a
    map-side hash probe + filter over the corpus scan, no corpus shuffle.
    """
    docs = _docs(spark, sf_dir)
    stats = docs.groupBy(F.col("source").alias("s_source")).agg(
        F.sum(F.col("n_chars").cast("decimal(18,0)")).alias("sum_chars"),
        F.count("*").alias("cnt"),
    )
    return (
        docs.join(F.broadcast(stats), F.col("source") == F.col("s_source"))
        .filter(
            F.col("n_chars").cast("decimal(18,0)") * F.col("cnt")
            > F.col("sum_chars")
        )
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "emb_label_centroids",
    oracle="""
SELECT label,
       CAST(dim - 1 AS BIGINT) AS dim,
       CAST(CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 1073741824.0) AS BIGINT))
                 AS DOUBLE)
            / (count(*) * 1073741824.0) AS DOUBLE) AS mean_val,
       count(*) AS n
FROM (
  SELECT label,
         unnest(embedding) AS val,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
GROUP BY label, dim
ORDER BY label, dim
""",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (mean vector), unnested to one row per
    (label, dimension) — the aggregate behind IVF centroid refinement and
    class-prototype similarity.

    The mean is computed in Q30 FIXED POINT so it is exact and
    order-independent: each component is widened to double (exact),
    scaled by 2^30 (a power-of-two multiply only shifts the exponent —
    no rounding), floored (floor has no tie mode, unlike decimal casts
    and round(), whose half-way rules differ between Spark's
    shortest-repr HALF_UP and DuckDB's binary-value rounding — both
    were observed to flip last digits here), and summed as BIGINT. One
    double division at the end rescales.

    Scale: groupBy on (label, dim) — cardinality |labels|·|dims|, partial
    combine reduces each scan partition to that size before the shuffle.
    A dense alternative (aggregate the array column with zip_with) avoids
    the explode entirely but loses the exact-decimal trick; at 100 TB the
    explode costs one pass and no extra shuffle volume (partials are
    already centroid-sized).
    """
    configure_runtime(spark)
    emb = load_compute_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", F.col("dim").cast("long").alias("dim"))
        .agg(
            (
                F.sum(
                    F.floor(F.col("val").cast("double") * F.lit(1073741824.0))
                ).cast("double")
                / (F.count("*") * F.lit(1073741824.0))
            )
            .cast("double")
            .alias("mean_val"),
            F.count("*").alias("n"),
        )
        .orderBy("label", "dim")
    )


@register(
    "vocab_src_full_outer_diff",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({TOKENS_SQL}) AS token FROM documents
  WHERE source IN ('src0', 'src1')
),
a AS (SELECT token, count(*) AS n FROM tok WHERE source = 'src0' GROUP BY token),
b AS (SELECT token, count(*) AS n FROM tok WHERE source = 'src1' GROUP BY token)
SELECT coalesce(a.token, b.token) AS token,
       coalesce(a.n, 0) AS n_src0,
       coalesce(b.n, 0) AS n_src1,
       coalesce(a.n, 0) - coalesce(b.n, 0) AS diff
FROM a FULL OUTER JOIN b ON a.token = b.token
ORDER BY token
""",
)
def vocab_src_full_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary diff between two sources via FULL OUTER join — the one
    join type the suite hadn't exercised: tokens unique to either side
    survive with a zero count on the missing side.

    Scale: both inputs are vocabulary-sized aggregates of one shared
    token scan; the full-outer join shuffles both on the token key (full
    outer can't broadcast — both sides' unmatched rows must survive).
    """
    docs = _docs(spark, sf_dir).filter(F.col("source").isin("src0", "src1"))
    tok = docs.select("source", F.explode(T.tokens(F.col("text"))).alias("token"))
    a = (
        tok.filter(F.col("source") == "src0")
        .groupBy("token")
        .agg(F.count("*").alias("n_a"))
    )
    b = (
        tok.filter(F.col("source") == "src1")
        .groupBy(F.col("token").alias("token_b"))
        .agg(F.count("*").alias("n_b"))
    )
    return (
        a.join(b, a["token"] == b["token_b"], "full_outer")
        .select(
            F.coalesce(F.col("token"), F.col("token_b")).alias("token"),
            F.coalesce(F.col("n_a"), F.lit(0)).alias("n_src0"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_src1"),
            (F.coalesce(F.col("n_a"), F.lit(0)) - F.coalesce(F.col("n_b"), F.lit(0))).alias("diff"),
        )
        .orderBy("token")
    )


@register(
    "documents_lang_source_chi2",
    oracle="""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
),
rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY lang),
ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY source),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM cells),
scored AS (
  SELECT cells.lang, cells.source,
         (CAST(cells.o AS DOUBLE) * tot.n - CAST(rt.r AS DOUBLE) * ct.c)
         * (CAST(cells.o AS DOUBLE) * tot.n - CAST(rt.r AS DOUBLE) * ct.c)
         / (CAST(tot.n AS DOUBLE) * rt.r * ct.c) AS term
  FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot
),
folded AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY lang, source)),
           (acc, x) -> acc + x) AS chi2
  FROM scored
)
SELECT tot.n AS n_docs,
       CAST((tot.n_langs - 1) * (tot.n_sources - 1) AS BIGINT) AS dof,
       round(folded.chi2, 4) AS chi2,
       round(sqrt(folded.chi2 / (tot.n * least(tot.n_langs - 1, tot.n_sources - 1))), 6)
         AS cramers_v
FROM folded, tot
""",
)
def documents_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between language and source (are
    sources language-balanced?) plus Cramer's V effect size. Observed and
    marginal counts are exact integers; each cell's term is one fixed
    double expression ((o*N - r*c)^2 / (N*r*c), computed in doubles since
    o*N overflows int64 at corpus scale), and the cell terms combine in an
    ORDER-PINNED fold (list ORDER BY lang, source — the emb_centroid_drift
    pattern), so the statistic is bit-stable on any partitioning.

    Scale: cells = |langs x sources| rows regardless of corpus size; the
    fold runs over that bounded list on one row.
    """
    configure_runtime(spark)
    # plain load (r11): the chi-square input is one JVM count aggregate —
    # per-row work is nil, so the compute-table scan-parallelism floor
    # (a full round-robin exchange at test scale) buys nothing here
    docs = load_table(spark, sf_dir, "documents")
    # cells feeds four consumers (row terms, both marginals, the totals);
    # all read the same canonical aggregation Exchange, so ReuseExchange
    # scans documents once (r11: replaced an eager localCheckpoint that
    # bought the same guarantee for an extra per-run job)
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("o")
    )
    rt = cells.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    ct = cells.groupBy("source").agg(F.sum("o").cast("bigint").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    num = F.col("o").cast("double") * F.col("n") - F.col("r").cast("double") * F.col("c")
    term = num * num / (F.col("n").cast("double") * F.col("r") * F.col("c"))
    scored = (
        cells.join(rt, "lang")
        .join(ct, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            F.struct(F.col("lang"), F.col("source"), term.alias("term")).alias("cell"),
            "n",
            "n_langs",
            "n_sources",
        )
    )
    folded = (
        scored.groupBy("n", "n_langs", "n_sources")
        .agg(F.collect_list("cell").alias("cells"))
        .select(
            "n",
            "n_langs",
            "n_sources",
            F.aggregate(
                F.transform(F.array_sort(F.col("cells")), lambda s: s.getField("term")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("chi2"),
        )
    )
    return folded.select(
        F.col("n").alias("n_docs"),
        ((F.col("n_langs") - 1) * (F.col("n_sources") - 1)).cast("bigint").alias("dof"),
        F.round(F.col("chi2"), 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("n_langs") - 1, F.col("n_sources") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# --- training-data mixture planning ------------------------------------------

# Target sampling weights per source family: the "data recipe" knob — which
# corpora to over/under-represent in the training mix relative to their raw
# availability. CASE ladder kept identical in Spark and SQL.
MIX_HIGH = ("src0", "src1")  # curated: 4x weight
MIX_MID = ("src2", "src3", "src4")  # reviewed: 2x weight
# Repetition cap: at most 5/4 epochs of any one source (kept rational so
# the cap is exact BIGINT math — (5*avail) div 4 — and so it actually BINDS
# for the 4x-weighted sources on this data, exercising both branches).
MIX_EPOCH_CAP_NUM = 5
MIX_EPOCH_CAP_DEN = 4


@register(
    "corpus_mixture_plan",
    oracle=f"""
WITH per_src AS (
  SELECT source,
         CAST(CASE WHEN source IN ('src0', 'src1') THEN 4
                   WHEN source IN ('src2', 'src3', 'src4') THEN 2
                   ELSE 1 END AS BIGINT) AS weight,
         CAST(sum(len({TOKENS_SQL})) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(weight) AS BIGINT) AS wsum,
         CAST(sum(avail_tokens) AS BIGINT) // 2 AS budget
  FROM per_src
)
SELECT source, weight, avail_tokens,
       (budget * weight) // wsum AS allotted_tokens,
       least((budget * weight) // wsum,
             ({MIX_EPOCH_CAP_NUM} * avail_tokens) // {MIX_EPOCH_CAP_DEN})
         AS realized_tokens,
       round(CAST(least((budget * weight) // wsum,
                        ({MIX_EPOCH_CAP_NUM} * avail_tokens) // {MIX_EPOCH_CAP_DEN})
                  AS DOUBLE)
             / CAST(avail_tokens AS DOUBLE), 6) AS epochs,
       (budget * weight) // wsum
         - least((budget * weight) // wsum,
                 ({MIX_EPOCH_CAP_NUM} * avail_tokens) // {MIX_EPOCH_CAP_DEN})
         AS deficit_tokens
FROM per_src CROSS JOIN tot
ORDER BY source
""",
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture plan: given per-source target weights (4x for
    curated sources, 2x reviewed, 1x rest) and a token budget (half the
    corpus), allocate tokens per source, cap repetition at 5/4 epochs of
    what the source actually has, and report the shortfall — the planning
    step every LLM data recipe runs before sampling. All allocation math
    is exact BIGINT (integer-div shares, least() caps — the cap binds for
    the 4x sources, so both branches are live); `epochs` is the only
    double and derives from the already-exact realized count, so the plan
    is bit-identical on any engine and any partitioning.

    Scale: ONE partial-combined groupBy(source) over the corpus (the only
    corpus-sized stage), then O(sources) arithmetic against a broadcast
    1-row totals frame. The plan feeds operators/sampling.py's
    source_token_quota / weighted samplers, which apply it row-locally.
    """
    docs = _docs(spark, sf_dir)
    ntok = F.size(T.tokens(F.col("text"))).cast("bigint")
    weight = (
        F.when(F.col("source").isin(*MIX_HIGH), F.lit(4))
        .when(F.col("source").isin(*MIX_MID), F.lit(2))
        .otherwise(F.lit(1))
        .cast("bigint")
    )
    per_src = docs.groupBy("source").agg(
        F.max(weight).alias("weight"),  # constant within a source
        F.sum(ntok).alias("avail_tokens"),
    )
    tot = per_src.agg(
        F.sum("weight").alias("wsum"),
        F.expr("sum(avail_tokens) div 2").alias("budget"),
    )
    # `div` = exact BIGINT floor division (Spark's `/` is double — lossy
    # past 2^53, which a 100 TB token budget exceeds)
    allotted = F.expr("(budget * weight) div wsum")
    realized = F.least(
        allotted,
        F.expr(f"({MIX_EPOCH_CAP_NUM} * avail_tokens) div {MIX_EPOCH_CAP_DEN}"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "weight",
            "avail_tokens",
            allotted.alias("allotted_tokens"),
            realized.alias("realized_tokens"),
            F.round(
                realized.cast("double") / F.col("avail_tokens").cast("double"), 6
            ).alias("epochs"),
            (allotted - realized).alias("deficit_tokens"),
        )
        .orderBy("source")
    )
