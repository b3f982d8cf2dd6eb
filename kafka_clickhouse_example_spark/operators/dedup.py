"""Deduplication operators for training-data pipelines: exact (hash-groupBy),
n-gram Jaccard (inverted-index join), MinHash+LSH (signature banding), and
SimHash fingerprints.

Scale design (100 TB corpus):

- Exact dedup is a single shuffle on a 16-byte hash — the groupBy key is
  md5(text), never the text itself, so shuffle volume is O(rows), not O(bytes).
- The exact-Jaccard inverted-index join explodes (doc, shingle) pairs and
  self-joins on shingle. Fine at moderate scale; its failure mode is hot
  shingles (stop-phrases) blowing up the join. ``max_shingle_freq`` drops
  shingles appearing in more than N docs — the standard "stop-shingle" cut
  that bounds the join's output quadratically.
- MinHash+LSH is the scale path: signatures are fixed-size (K longs per doc
  regardless of doc length), candidate generation shuffles on band keys
  (bounded fan-out), and only candidates pay the exact-verify cost. This is
  the shape that survives 100 TB; the exact join is the oracle for it.
- Everything is column expressions; no Python in any hot path.

Expression-evaluation discipline (the performance lesson measured on this
module's first version): higher-order array functions (transform/aggregate)
run *interpreted*, outside whole-stage codegen, and Catalyst does NOT
common-subexpression-eliminate a repeated subtree inside one projection. A
signature expression that inlines ``split(text)`` is therefore re-split for
every band × perm × element — a combinatorial re-evaluation blowup (measured:
one sf0.1 task pinned a core for >10 min). Every operator here materializes
each intermediate (tokens -> shingles -> hashes -> signature -> band keys) as
its own projection step with ``withColumn``, so each evaluates exactly once
per row; CollapseProject keeps multiply-referenced non-trivial aliases
un-inlined.

Hash budget: one md5 per shingle/token. MinHash permutations use
Kirsch-Mitzenmacher double hashing — perm_p(s) = (h1(s) + p*h2(s)) mod P —
with h1/h2 the two 56-bit halves of a single md5. Determinism: md5-derived
values are bit-stable across engines, so the DuckDB oracle reproduces
signatures exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.checkpointing import materialize
from kafka_clickhouse_example_spark.operators.planning import (  # noqa: F401 — corpus_side re-exported; pair/verify plans and callers use it
    POSTING_ROW_BYTES,
    SHINGLE_ARRAY_ROW_BYTES,
    corpus_side,
    warn_if_task_state_overflows,
)

NGRAM_DEFAULT = 3

# FIXTURE profile: small signatures so the DuckDB oracle (which recomputes
# all perms in SQL) stays tractable at gate scale. The banding math is the
# same at any size; only the S-curve sharpness changes.
MINHASH_PERMS = 8
LSH_BAND_ROWS = 2  # 8 perms / 2 rows => 4 bands; ~50% threshold (1/4)^(1/2)

# PRODUCTION profile: what a real 100 TB near-dup pass should run
# (datasketch/Spark-LSH-class sizing). 64 perms / 4 rows => 16 bands:
# candidate threshold (1/16)^(1/4) ~= 0.50 with a far sharper S-curve than
# the fixture profile — P(candidate) >= 0.999 at j=0.8 while j=0.2 noise
# drops to ~2.5% (vs 15% at 8/2), i.e. ~6x less exact-verify work per true
# pair. Bounded by the hash math: perm index p must stay < 64 so
# p*h2 < 2^62 and (h1 + p*h2) cannot overflow BIGINT (h1, h2 < 2^56).
# tests/test_dedup_paths.py::test_banding_threshold_curve pins the curve.
PRODUCTION_MINHASH_PERMS = 64
PRODUCTION_LSH_BAND_ROWS = 4

HASH_PRIME = 72057594037927931  # largest prime < 2^56; keeps p*h2 overflow-free


def candidate_probability(j: float, band_rows: int, num_bands: int) -> float:
    """Analytic LSH candidacy probability 1-(1-j^r)^b for a pair with true
    Jaccard ``j`` under ``num_bands`` bands of ``band_rows`` rows."""
    return 1.0 - (1.0 - j**band_rows) ** num_bands


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles_from_tokens(toks: Column, n: int = NGRAM_DEFAULT) -> Column:
    """Distinct word n-gram shingles as an array<string>, from a
    *materialized* token-array column (evaluate ``_tokens`` once per row —
    see module docstring).

    Guarded so docs with < n tokens yield an empty array (Spark's
    ``sequence(1, 0)`` would otherwise produce a *descending* sequence).
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array()))


def md5_half(s: Column, which: int) -> Column:
    """56-bit integer from half of md5(s): hex chars 1-14 (which=0) or 15-28
    (which=1). Mirrors DuckDB ('0x' || substr(md5(s), start, 14))::BIGINT."""
    from kafka_clickhouse_example_spark.operators.sampling import md5_prefix_long

    return md5_prefix_long(s, 14, start=1 + which * 14)


def perm_hash_from_halves(h1: Column, h2: Column, perm: int) -> Column:
    """Kirsch-Mitzenmacher permutation p: (h1 + p*h2) mod P. With h1,h2 <
    2^56 and p < 16 the product stays < 2^60 — no 64-bit overflow in Spark
    or DuckDB (DuckDB *errors* on BIGINT overflow rather than wrapping)."""
    return (h1 + F.lit(perm) * h2) % F.lit(HASH_PRIME)


def _shingles_pandas_udf(n: int = NGRAM_DEFAULT):
    @F.pandas_udf("array<string>")
    def shingles_udf(text: pd.Series) -> pd.Series:
        import re

        # Reproduce the column path EXACTLY (ADVICE r1): Spark trim() strips
        # ASCII spaces only and Java \s is the ASCII class [ \t\n\x0B\f\r],
        # with split keeping leading/trailing empty tokens. Python's unicode
        # \s+ over str.strip() would drop a leading empty token for
        # tab/newline-padded text and split on NBSP/CJK spaces — silently
        # diverging from both the use_arrow=False path and the DuckDB oracle.
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        out = []
        for t in text:
            # NULL text -> EMPTY array, matching the column path exactly
            # (its shingle builder collapses the NULL token array to []):
            # drop_empty's size>0 filter then drops it, and a
            # drop_empty=False consumer's explode([]) emits no rows.
            # Without this guard one NULL document ABORTS the whole job
            # (the BPE NULL-text crash class from round 5, here in the
            # dedup kernel; pinned by tests/test_dedup_paths.py).
            if t is None:
                out.append([])
                continue
            toks = ws.split(t.strip(" "))
            if len(toks) < n:
                out.append([])
                continue
            seen: set[str] = set()
            res: list[str] = []
            for i in range(len(toks) - (n - 1)):
                s = " ".join(toks[i : i + n])
                if s not in seen:
                    seen.add(s)
                    res.append(s)
            out.append(res)
        return pd.Series(out)

    return shingles_udf


def with_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "sh",
    *,
    n: int = NGRAM_DEFAULT,
    use_arrow: bool = True,
    drop_empty: bool = True,
) -> DataFrame:
    """(id, shingle-array) with empty-shingle docs dropped.

    ``drop_empty=False`` skips the size()>0 filter: a consumer that
    immediately explodes the array drops empties for free, and the filter
    would otherwise make Catalyst evaluate the shingle UDF TWICE (once for
    the predicate, once for the projection — the re-eval pitfall).

    Default path is an Arrow-vectorized pandas UDF: Catalyst's higher-order
    ``transform`` runs interpreted and costs ~32 us per shingle (measured
    8.4s for 250k shingles at sf0.1); the Arrow batch path produces the
    *identical* arrays (same first-occurrence order as array_distinct) in
    1.3s. ``use_arrow=False`` keeps the pure-column-expression plan
    (tests assert both paths agree; the DuckDB oracle mirrors the column
    semantics either way).
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    if use_arrow:
        shingled = base.withColumn(out, _shingles_pandas_udf(n)(F.col("_text")))
    else:
        shingled = base.withColumn("_toks", _tokens(F.col("_text"))).withColumn(
            out, shingles_from_tokens(F.col("_toks"), n)
        )
    if drop_empty:
        shingled = shingled.filter(F.size(out) > 0)
    return shingled.select("doc_id", out)


def _md5half_array_udf(which: int = 0):
    @F.pandas_udf("array<long>")
    def md5half_udf(sh: pd.Series) -> pd.Series:
        import hashlib

        lo, hi = which * 14, which * 14 + 14
        # NULL array -> NULL (column path: transform(NULL) is NULL); a
        # consumer's explode(NULL) then emits no rows either way
        return pd.Series(
            [
                None
                if lst is None
                else [
                    int(hashlib.md5(s.encode("utf-8")).hexdigest()[lo:hi], 16)
                    for s in lst
                ]
                for lst in sh
            ]
        )

    return md5half_udf


def _minhash_pandas_udf(num_perms: int = MINHASH_PERMS):
    @F.pandas_udf("array<long>")
    def minhash_udf(sh: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for shingle_list in sh:
            if shingle_list is None:  # NULL array -> NULL signature
                out.append(None)
                continue
            mins = [None] * num_perms
            for s in shingle_list:
                hx = hashlib.md5(s.encode("utf-8")).hexdigest()
                h1 = int(hx[0:14], 16)
                h2 = int(hx[14:28], 16)
                for p in range(num_perms):
                    v = (h1 + p * h2) % HASH_PRIME
                    if mins[p] is None or v < mins[p]:
                        mins[p] = v
            out.append(mins)
        return pd.Series(out)

    return minhash_udf


def with_minhash_signature(
    shingled: DataFrame,
    sh_col: str = "sh",
    num_perms: int = MINHASH_PERMS,
    *,
    use_arrow: bool = True,
) -> DataFrame:
    """Adds ``mh``: array<long> minhash signature — min over shingles of
    Kirsch-Mitzenmacher perm hashes (h1 + p*h2) mod P, one md5 per shingle.

    Arrow path by default (same interpreted-HOF economics as
    ``with_shingles``); the column path materializes two md5-half arrays and
    folds each permutation with zip_with + array_min. Identical outputs.
    """
    if use_arrow:
        return shingled.withColumn("mh", _minhash_pandas_udf(num_perms)(F.col(sh_col)))
    out = (
        shingled.withColumn("_h1", F.transform(F.col(sh_col), lambda s: md5_half(s, 0)))
        .withColumn("_h2", F.transform(F.col(sh_col), lambda s: md5_half(s, 1)))
        .withColumn(
            "mh",
            F.array(
                *[
                    F.array_min(
                        F.zip_with(
                            "_h1", "_h2", lambda a, b: perm_hash_from_halves(a, b, p)
                        )
                    )
                    for p in range(num_perms)
                ]
            ),
        )
    )
    return out.drop("_h1", "_h2")


def band_keys(
    signature: Column,
    band_rows: int = LSH_BAND_ROWS,
    num_perms: int = MINHASH_PERMS,
) -> Column:
    """array<string> of LSH band keys: '<band>|mh_i|mh_i+1|...'.

    Two docs collide on a band iff that band's rows agree exactly — the
    classic banding construction (prob of candidacy 1-(1-j^r)^b). Call on a
    *materialized* signature column only.
    """
    num_bands = num_perms // band_rows
    keys = []
    for b in range(num_bands):
        parts: list[Column] = [F.lit(f"{b}")]
        for r in range(band_rows):
            parts.append(F.element_at(signature, b * band_rows + r + 1).cast("string"))
        keys.append(F.concat_ws("|", *parts))
    return F.array(*keys)


def content_hash(text_col: str = "text") -> Column:
    """THE exact-dedup content hash: md5 over the utf-8 bytes, NULL text ->
    NULL (which equi-joins never match — NULL-text docs are invisible to
    the exact leg everywhere). One definition shared by exact groups, the
    ingest gate's exact leg (live and served), and the materialized store
    (dedup_store.py) — stored and recomputed hashes must never drift."""
    return F.md5(F.col(text_col).cast("binary"))


def shingle_array(text: Column, n: int = NGRAM_DEFAULT) -> Column:
    """The Arrow shingle kernel as a plain Column — for callers that need
    the shingle array alongside OTHER projections in one scan (the
    materialized store). with_shingles wraps this with the standard
    (doc_id, sh) shape."""
    return _shingles_pandas_udf(n)(text)


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash, keep canonical (min id) + count."""
    return (
        df.groupBy(content_hash(text_col).alias("content_md5"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _pair_common_counts(
    with_sh: DataFrame,
    max_shingle_freq: int | None = None,
    *,
    postings_estimate: int | None = None,
    raw_shingles: bool = False,
) -> DataFrame:
    """Shared candidate core for the set-overlap dedup family: from a
    (doc_id, sh) relation build the inverted index, optionally cut hot
    shingles, and return (id1 < id2, n_common, n_sh1, n_sh2). Jaccard and
    containment differ only in the final score formula.

    The per-doc set sizes ride ON the inverted-index rows (+8 bytes per
    posting) and come out of the pair aggregation as first() — NOT via
    joins back to an O(corpus) sizes relation. The join form was the
    round-10 probe's second finding: Catalyst statically BROADCASTS a
    corpus-proportional side when the memoized relation's estimate reads
    small (dying at spark.driver.maxResultSize at 1.5M docs), and the
    shuffle-hash repair dies building per-task hash relations on the same
    corpus ("Can't acquire ... bytes to build hash relation" — the exact
    r9 split-leakage failure). Carrying the size through the aggregation
    removes the join, the hazard, and a shuffle stage at every scale."""
    sized = with_sh.select("doc_id", "sh", F.size("sh").alias("n_sh"))
    # Invert on the 56-bit shingle *hash*, not the string: ~8x less shuffle
    # IO, long-vs-long join keys. (Distinct strings already; a hash collision
    # would merge two shingles — the oracle applies the identical hash, so
    # both engines agree on the operator's defined semantics.) Hashing runs
    # in the Arrow path for the same interpreted-HOF reason as the shingles.
    # The UDF is materialized by withColumn BEFORE the explode: nesting it
    # inside explode() directly makes Catalyst duplicate the upstream UDF
    # chain into the Generate (measured 8.4s vs 1.7s at sf0.1).
    inverted = (
        sized.withColumn("_hs", _md5half_array_udf()(F.col("sh")))
        .select("doc_id", "n_sh", F.explode("_hs").alias("shingle"))
    )
    if max_shingle_freq is not None:
        # Hot-shingle cut as a WINDOW over the shingle-partitioned index
        # (r11 restructure): count(*) over (partition by shingle) attaches
        # each posting's global frequency inside the hashpartitioning(
        # shingle) exchange the self-join needs anyway, so the cut costs a
        # per-partition sort — no hot-list aggregate, no broadcast, no
        # anti-join, and (decisively) ONE run of the shingle+hash UDF
        # chain: both self-join sides read the same canonical exchange via
        # ReuseExchange. The pre-r11 shape (derive hot list, broadcast,
        # anti-join) needed an eager localCheckpoint to stop the kernel
        # running 3x, paying a materialization job + count per call
        # (~1.5 s/run at sf0.1 on the registered stop-cut query).
        # Partition-sizing guard on the pinned-SHJ self-join below (the
        # per-task hash build died at sf30ctl/32 partitions — SCALE.md).
        # Estimate source, in preference order (round-11 verdict ask #8 —
        # zero Spark jobs at construction — and the round-11 ADVICE
        # corrections):
        #   1. ``postings_estimate`` from the caller — the memoized corpus
        #      store already knows sum(size(sh)) from its residency-guard
        #      pass, so the registered queries pay NO per-construction job.
        #   2. For precomputed-but-unstatted shingle relations, one
        #      column-pruned agg over the caller's (usually cached) blocks.
        #   3. For shingles derived from RAW text (``raw_shingles``), skip:
        #      n_sh = size(sh) cannot be pruned past the Arrow UDF that
        #      produces sh, so the agg would run the shingle kernel over
        #      the whole corpus once EXTRA just to maybe warn — the same
        #      trade as incremental_minhash_pairs' corpus_shingles-only
        #      guard.
        # The estimate counts PRE-cut postings, deliberately conservative:
        # the SHJ build below sees post-cut rows, so a warning fires at or
        # before the true overflow point, never after.
        n_postings = postings_estimate
        if n_postings is None and not raw_shingles:
            n_postings = sized.agg(F.sum("n_sh")).first()[0] or 0
        overflow = None
        if n_postings is not None:
            overflow = warn_if_task_state_overflows(
                sized.sparkSession,
                int(n_postings),
                POSTING_ROW_BYTES,
                "inverted-index self-join (SHJ build)",
            )
        if overflow is None:
            # Fits per-task bounds: the window form (measured fastest at
            # test scale — within-session A/B r12: window 1.23 s vs the
            # aggregate-join form 1.99 s best-of-3).
            w = Window.partitionBy("shingle")
            inverted = (
                inverted.withColumn("_freq", F.count("*").over(w))
                .filter(F.col("_freq") <= max_shingle_freq)
                .drop("_freq")
            )
        else:
            # SKEW-SAFE form when the sizing rule predicts overflow
            # (round-11 ADVICE): a stop-shingle present in a large corpus
            # fraction routes ALL its postings into one partition, and the
            # window's sort must BUFFER them before the filter drops them —
            # a single-task spill cliff that more partitions cannot fix
            # (one key cannot be split). The cut instead hangs a
            # count-per-shingle aggregate and a partition-local join off
            # the SAME canonical exchange (explicit repartition; both
            # consumers reuse it, kernel still runs once): the hash
            # aggregate holds O(distinct shingles/partition) state — never
            # O(postings) — and hot postings STREAM through the join probe
            # and drop, nothing buffers them. No broadcast either: a
            # freq>max hot LIST is bounded only by postings/max, which at
            # stop-cut scale can itself outgrow a broadcast — the surviving
            # ok-list stays distributed, ~8 B x vocab/partitions per task.
            exchanged = inverted.repartition("shingle")
            ok = (
                exchanged.groupBy("shingle")
                .agg(F.count("*").alias("_freq"))
                .filter(F.col("_freq") <= max_shingle_freq)
                .select("shingle")
                .hint("shuffle_hash")
            )
            inverted = exchanged.join(ok, "shingle")
    # The self-join must NOT broadcast: the inverted index is O(corpus) — at
    # 100 TB broadcasting it is fatal, and even locally the build is a serial
    # bottleneck (Spark underestimates post-explode cardinality). Shuffle
    # hash join partitions both sides by shingle.
    a = inverted.alias("a")
    b = inverted.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(
            F.count("*").alias("n_common"),
            # safe under partial aggregation (first() DOES partially
            # aggregate): n_sh is constant within the group — one n_sh
            # per doc — so any partial's first equals the group's value
            F.first(F.col("a.n_sh")).alias("n_sh1"),
            F.first(F.col("b.n_sh")).alias("n_sh2"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
    shingles: DataFrame | None = None,
    postings_estimate: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs via inverted-index self-join.

    j(a,b) = |Sa ∩ Sb| / (|Sa| + |Sb| - |Sa ∩ Sb|), computed from integer
    counts (the division is a single double op — deterministic).

    ``shingles`` accepts a precomputed (doc_id, sh) relation so callers
    running several dedup operators over one corpus (jaccard, stop-cut,
    clusters, minhash) tokenize once instead of per-operator;
    ``postings_estimate`` (sum of shingle-set sizes, known to memoized /
    parquet-backed stores) feeds the stop-cut sizing guard without any
    per-construction Spark job.
    """
    with_sh = shingles if shingles is not None else with_shingles(df, text_col, id_col)
    return (
        _pair_common_counts(
            with_sh,
            max_shingle_freq,
            postings_estimate=postings_estimate,
            raw_shingles=shingles is None,
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_sh1") + F.col("n_sh2") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_common", "n_sh1", "n_sh2", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
    shingles: DataFrame | None = None,
    postings_estimate: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: C = |Sa ∩ Sb| / min(|Sa|, |Sb|)
    — the smaller document's shingle coverage by the larger. Catches what
    symmetric Jaccard structurally cannot: a short document quoted or
    boilerplate-wrapped inside a much longer one has C ≈ 1 but Jaccard ≈
    |small|/|big| ≈ 0, so it never crosses a Jaccard threshold. The output
    is directional — (contained_id, container_id) ordered so the SMALLER
    shingle set is the contained side (doc_id tiebreak on equal sizes).

    Scale: identical candidate core as ``jaccard_pairs`` (inverted-index
    shuffle-hash self-join, optional hot-shingle cut) — only the score
    formula differs, so the same 100 TB analysis applies.
    """
    with_sh = shingles if shingles is not None else with_shingles(df, text_col, id_col)
    scored = (
        _pair_common_counts(
            with_sh,
            max_shingle_freq,
            postings_estimate=postings_estimate,
            raw_shingles=shingles is None,
        )
        .withColumn(
            "containment",
            F.col("n_common").cast("double")
            / F.least("n_sh1", "n_sh2").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
    )
    # id1 < id2 always (candidate-join invariant), so <= makes the lower
    # doc_id the contained side on equal sizes — a total, deterministic rule
    smaller_is_1 = F.col("n_sh1") <= F.col("n_sh2")
    return scored.select(
        F.when(smaller_is_1, F.col("id1")).otherwise(F.col("id2")).alias("contained_id"),
        F.when(smaller_is_1, F.col("id2")).otherwise(F.col("id1")).alias("container_id"),
        F.when(smaller_is_1, F.col("n_sh1")).otherwise(F.col("n_sh2")).alias("n_sh_contained"),
        F.when(smaller_is_1, F.col("n_sh2")).otherwise(F.col("n_sh1")).alias("n_sh_container"),
        "n_common",
        "containment",
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
    num_perms: int = MINHASH_PERMS,
    band_rows: int = LSH_BAND_ROWS,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: signature -> band bucketing -> candidate
    pairs -> exact Jaccard verify on the candidates only.

    The verify joins candidates back to the per-doc shingle arrays and
    intersects them — O(candidates), never O(n^2). This is the 100 TB path:
    signatures and band keys are fixed-size per doc, and the band join's
    fan-out is bounded by bucket sizes, not corpus size.

    Defaults are the oracle-tractable FIXTURE profile (8 perms / 4 bands);
    pass ``num_perms=PRODUCTION_MINHASH_PERMS, band_rows=
    PRODUCTION_LSH_BAND_ROWS`` for the documented production sizing (see
    the profile constants at the top of this module). The exact-verify
    stage makes the OUTPUT precision-exact under every profile — banding
    only changes candidate recall and verify workload.
    """
    assert num_perms % band_rows == 0 and num_perms <= 64, (
        "perm index must stay < 64: p*h2 < 2^62 keeps the Kirsch-"
        "Mitzenmacher hash overflow-free on BIGINT"
    )
    with_sh = shingles if shingles is not None else with_shingles(df, text_col, id_col)
    banded = (
        with_minhash_signature(with_sh, num_perms=num_perms)
        .withColumn("bk", F.explode(band_keys(F.col("mh"), band_rows, num_perms)))
        .select("doc_id", "bk")
    )
    # Same rule as jaccard_pairs: never broadcast the O(corpus) banded side.
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    candidates = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    # The verify sides carry the full shingle ARRAYS and are O(corpus) —
    # the relation Catalyst statically broadcast at 1.5M docs until the
    # round-10 probe measured it dying at maxResultSize, and whose
    # shuffled-hash repair died building per-task hash relations on the
    # same corpus (see corpus_side: SMJ, spill-safe).
    sh1 = corpus_side(with_sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1")))
    sh2 = corpus_side(with_sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2")))
    return (
        candidates.join(sh1, "id1")
        .join(sh2, "id2")
        .withColumn("n_common", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("sh1") + F.size("sh2") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_common", "jaccard")
    )


def duplicate_clusters(
    pairs: DataFrame, max_iterations: int = 20, reliable_dir: str | None = None
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every member
    labeled with its cluster's minimum doc id (the canonical survivor).

    Iterative min-label propagation — each round, every node takes the min
    label among itself and its neighbors; converges in O(graph diameter)
    rounds. This is the standard large-scale CC shape (a handful of
    join+groupBy rounds, each a bounded shuffle); a driver-side loop over
    *rounds* is fine at any scale because the loop count is log-ish in
    cluster size, never data size. Non-SQL-single-query by nature — the
    DuckDB oracle uses a recursive CTE over the same pair list.

    Input: (id1, id2) pairs (id1 < id2). Output: (doc_id, cluster_id) for
    every node that appears in some pair, cluster_id = min id reachable.

    Lineage per round is cut executor-locally by default; pass
    ``reliable_dir`` (HDFS/S3) for fault-tolerant ``checkpoint()`` on a
    real cluster (see operators/checkpointing.py).
    """
    edges = materialize(
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionAll(pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
        .distinct(),
        # Materialize once: every propagation round joins `edges`, and
        # without this each round re-derives the (expensive) pair graph.
        reliable_dir,
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    # Every relation in the propagation loop — edges, labels, per-round
    # neighbor minima — is corpus-proportional (O(edges)/O(nodes)), and the
    # memoized inputs carry the LogicalRDD under-estimate that round 10
    # measured static-broadcasting O(corpus) sides in the verify joins
    # (labels here planned as BroadcastHashJoin at test scale): pin every
    # round join to SMJ (see corpus_side).
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(corpus_side(labels), edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(corpus_side(neighbor_min), labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        # Truncate lineage per round: without this the plan deepens by
        # two joins per iteration (re-executed from scratch by both the
        # convergence check and the next round).
        new_labels = materialize(new_labels, reliable_dir)
        # Convergence check every other round (each check is a full join
        # job; min-label propagation usually converges in a handful of
        # rounds, so one extra round costs less than a check per round).
        if it % 2 == 1 or it == max_iterations - 1:
            changed = (
                new_labels.alias("n")
                .join(corpus_side(labels.alias("o")), F.col("n.node") == F.col("o.node"))
                .filter(F.col("n.lbl") != F.col("o.lbl"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = new_labels
                break
        labels = new_labels
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


SIMHASH_BITS = 16


def _simhash_pandas_udf(bits: int):
    @F.pandas_udf("long")
    def simhash_udf(text: pd.Series) -> pd.Series:
        import hashlib
        import re

        import numpy as np

        ws = re.compile(r"[ \t\n\x0b\f\r]+")  # exact column-path tokenizer
        mask = (1 << bits) - 1
        out = []
        for t in text:
            toks = ws.split(t.strip(" "))
            if not toks:
                out.append(0)
                continue
            hs = np.fromiter(
                (
                    int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:14], 16) & mask
                    for tok in toks
                ),
                dtype=np.int64,
                count=len(toks),
            )
            # bit matrix (n_tokens, bits) -> per-bit +/-1 sums -> sign bits
            bitmat = (hs[:, None] >> np.arange(bits)[None, :]) & 1
            sums = (2 * bitmat - 1).sum(axis=0)
            fp = int(((sums >= 0).astype(np.int64) << np.arange(bits)).sum())
            out.append(fp)
        return pd.Series(out, dtype="int64")

    return simhash_udf


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out: str = "simhash",
    bits: int = SIMHASH_BITS,
    use_arrow: bool = True,
) -> DataFrame:
    """``bits``-wide SimHash per row (default 16): bit i is the sign of the
    sum of +-1 contributions from each token's hash bit i; frequency-weighted
    by construction (duplicate tokens contribute multiply).

    Default path is an Arrow pandas UDF (tokenize + md5 + a single numpy
    bit-matrix reduction per doc): the column-expression path's ``bits``
    interpreted folds over the token-hash array cost ~bits × tokens
    interpreted ops per row (measured 2.15 s -> 1.5 s for the 32-bit pair
    query at sf0.1). ``use_arrow=False`` keeps the pure column plan: one
    md5 per token, hash array materialized once, per-bit +-1 folds.
    (F.shiftright requires a literal shift amount, which rules out a
    single fold with a transform-indexed accumulator.) Both paths are
    bit-identical (tests/test_dedup_paths.py) and mirror the DuckDB
    oracle. ``bits`` must stay < 63 so the fingerprint fits a BIGINT in
    both engines (md5_half supplies 56 hash bits; wider fingerprints
    would need the second md5 half).
    """
    assert 0 < bits <= 56, "simhash width limited by the 56-bit md5 half"
    if use_arrow:
        return df.withColumn(out, _simhash_pandas_udf(bits)(F.col(text_col)))

    def bit_count(i: int) -> Column:
        def step(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(F.col("_th"), F.lit(0).cast("long"), step)

    fingerprint = None
    for i in range(bits):
        bit = F.when(F.element_at(F.col("_bits"), i + 1) >= 0, F.lit(2**i)).otherwise(
            F.lit(0)
        )
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return (
        df.withColumn("_toks", _tokens(F.col(text_col)))
        .withColumn("_th", F.transform(F.col("_toks"), lambda t: md5_half(t, 0)))
        .withColumn("_bits", F.array(*[bit_count(i) for i in range(bits)]))
        .withColumn(out, fingerprint.cast("long"))
        .drop("_toks", "_th", "_bits")
    )


SPAN_WINDOW = 8


def duplicated_span_stats(
    df: DataFrame,
    window: int = SPAN_WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span statistics — the scalable approximation
    of suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): a position is duplicated
    if its ``window``-token sliding span (stride 1, positions kept — NOT
    the distinct-shingle set) occurs >= 2 times anywhere in the corpus.
    Emits (doc_id, n_windows, n_dup_windows, dup_frac) for docs with at
    least one window; a downstream pass can cut or trim high-dup_frac docs.

    Scale shape (100 TB): a true distributed suffix array is impractical;
    this is the standard fixed-window relaxation. Cost is one corpus scan
    producing O(total_tokens) (doc, span-hash) rows (56-bit hashes, not
    span text — ~8x less exchange IO), ONE hash-partitioned exchange for
    the per-hash frequency (count over partition — no join back needed),
    and a per-doc re-aggregation. Hot spans (boilerplate repeated 10^7
    times) skew the frequency partition; mitigation at scale is the same
    stop-key cut as ``jaccard_pairs``'s ``max_shingle_freq`` — frequency
    capping changes nothing downstream because any freq >= 2 is already
    "duplicated".
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    spans = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - (window - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_toks"), i + j) for j in range(window)]
        ),
    )
    wins = (
        toks.withColumn(
            "_wins",
            F.when(F.size("_toks") >= window, spans).otherwise(F.array()),
        )
        # materialize the UDF output BEFORE the explode (same Catalyst
        # duplicate-the-UDF-chain trap as jaccard_pairs, dedup.py:308)
        .withColumn("_hs", _md5half_array_udf()(F.col("_wins")))
        .select(F.col(id_col), F.explode("_hs").alias("h"))
    )
    freq = wins.withColumn("freq", F.count("*").over(Window.partitionBy("h")))
    return (
        freq.groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum((F.col("freq") >= 2).cast("long")).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup_windows").cast("double") / F.col("n_windows").cast("double"),
        )
    )


SIMHASH_PAIR_BITS = 32
SIMHASH_MAX_HAMMING = 3


def simhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    bits: int = SIMHASH_PAIR_BITS,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs with SimHash Hamming distance <= ``max_hamming``,
    via the Manku/Jain/Sarma block-permutation scheme (WWW'07): split the
    ``bits``-wide fingerprint into ``max_hamming + 1`` equal blocks — by
    pigeonhole, any pair within Hamming distance k must agree EXACTLY on at
    least one block. Candidate generation is then an equi-join on
    (block_index, block_value); only candidates pay the exact
    bit_count(xor) verify.

    Scale shape (100 TB): the all-pairs O(n^2) comparison never happens —
    the join fans out each doc into k+1 (block, value) rows and shuffles on
    the block key. Collision rate per block is n / 2^(bits/(k+1)): at
    production scale run 64-bit fingerprints (k=3 -> 16-bit blocks, ~65k
    buckets) and, per the paper, permuted re-blocking for tighter radii. The
    fixture profile (32-bit, 8-bit blocks) keeps the DuckDB oracle's exact
    pair check tractable while exercising the identical plan.

    The self-join must not broadcast (the block table is O(corpus)) and the
    two sides must not collapse into one Exchange reuse that AQE could
    mis-size: shuffle_hash pins the strategy, same rationale as
    ``jaccard_pairs``.
    """
    n_blocks = max_hamming + 1
    assert bits % n_blocks == 0, "fingerprint width must split into equal blocks"
    width = bits // n_blocks
    mask = (1 << width) - 1
    if fingerprints is not None:
        fp = fingerprints
    else:
        # No materialization (r12, mirroring the r11 mm_image_phash change):
        # both self-join sides read the same canonical (blk, val) exchange,
        # so ReuseExchange runs the tokenize + ``bits``-md5-fold kernel ONCE
        # inside one job — the pre-r12 eager checkpoint bought that same
        # single-pass guarantee for an extra per-construction Spark job
        # (plan-verified: executed plan has ArrowEvalPython x1,
        # ReusedExchange x1, zero checkpoint RDD scans; within-session
        # A/B best-of-3 r12: eager 1.90 s vs reuse 1.59 s at sf0.1).
        fp = with_simhash(df, text_col, "sh", bits=bits).select(id_col, "sh")
    blocks = fp.select(
        F.col(id_col),
        F.col("sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("sh"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("sh"), F.col("bk.blk"), F.col("bk.val"))
    a = blocks.alias("a")
    b = blocks.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        # a pair agreeing on several blocks appears once per agreeing block
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# Executable bounded-batch contract for incremental_minhash_pairs'
# broadcast strategy (round-9 verdict ask #4). The broadcast shape has a
# HARD architectural ceiling (Spark caps any broadcast relation at 8 GiB),
# and the round-9 sweep proved a corpus-PROPORTIONAL "new" side reaches it:
# the split-leakage audit's 10%-of-corpus slice (12.5% of its 80% train
# side) OOMed a 16 GiB heap and hit the cap outright at 64 GiB. The knob
# fixed that caller, but nothing stopped a FUTURE caller from feeding
# another corpus-proportional delta to the broadcast default — so the
# contract now raises instead of letting the job die hours later:
#
# - bound 0.10: above a 10% new/corpus row ratio the delta is growing with
#   the corpus, not arriving as a bounded batch — the measured-failing
#   audit shape (0.125) is over it, the largest legitimate registered
#   ingest shape (dedup_incremental_minhash's 1-of-20-sources slice,
#   ~0.053, sf10-green) is under it with 2x margin.
# - floor 10_000 new rows: below it the broadcast is KBs-to-MBs and the
#   ratio is meaningless (unit tests gate 5-doc batches against 20-doc
#   corpora); the floor also keeps the common bounded-batch path free of
#   the corpus-side count entirely.
#
# The counts are cheap where the guard fires: the new side is either a
# caller-precomputed relation (memoized checkpoint / parquet store in
# every production path) or was just eagerly checkpointed from raw text,
# and the corpus side is counted through whichever relation the caller
# supplied — count() prunes the shingle kernel off a raw corpus_df scan.
BROADCAST_NEW_RATIO_BOUND = 0.10
BROADCAST_GUARD_MIN_NEW_ROWS = 10_000


def incremental_minhash_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    new_shingles: DataFrame | None = None,
    corpus_shingles: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
    strategy: str = "broadcast",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Incremental ingest dedup: near-dup pairs between a NEW batch and the
    EXISTING corpus, without re-deduping the corpus against itself.

    Production pipelines ingest continuously; re-running all-corpus LSH per
    batch is O(corpus) shuffle every day. The incremental shape exploits
    the asymmetry — the daily batch is tiny against the accumulated corpus:

    - the new batch's band keys (and later its shingle arrays) BROADCAST;
    - the corpus is scanned in place: band-key candidates fall out of a
      map-side broadcast join against each corpus row's band keys, and the
      exact-Jaccard verify joins the (small) candidate list back through
      the corpus scan the same way;
    - the corpus is therefore never shuffled, never self-joined. Total cost
      per batch: two corpus scans (one computing signatures for band-key
      candidates, one re-reading shingles for the exact verify) +
      O(candidates) work — both map-side.

    Pair orientation is (new_id, corpus_id); ids live in disjoint sets so
    no < ordering is needed. Same signatures/bands/threshold as
    `minhash_lsh_pairs`, so batch-mode and incremental-mode agree on what a
    duplicate is.

    ``new_shingles``/``corpus_shingles`` accept precomputed (doc_id, sh)
    relations — the production shape, where the accumulated corpus's
    shingles were materialized at ingest and each batch reads them instead
    of re-tokenizing the whole corpus per run. ``corpus_bands`` goes one
    step further with a precomputed (doc_id, bk) band-key relation
    (operators/dedup_store.py): the per-batch cost then drops to a
    column-pruned scan of the stored keys — no md5/minhash kernel runs
    over the corpus at all, which is the dominant per-batch CPU when only
    shingles are precomputed.

    ``strategy`` selects the PHYSICAL join shape; the emitted pairs are
    identical (pinned by tests/test_dedup_paths.py):

    - ``"broadcast"`` (default): the new-side relations broadcast — the
      |new| << |corpus| ingest contract above. Since r11 the verify
      broadcasts are ARRAY-FREE on the candidate axis: the skinny
      (new_id, corpus_id) pair list (16 B/row) joins the corpus scan
      first and the batch-bounded new-side arrays attach afterwards, so
      candidate fan-out on a dup-heavy corpus no longer multiplies
      broadcast BYTES (the pre-r11 shape carried one shingle array per
      candidate row and died at spark.driver.maxResultSize at 1.5M
      candidates; the same store now broadcasts ~24 MB). The remaining
      ceiling is Spark's hard 8 GiB / 512M-row broadcast cap on the pair
      list itself (~100x past the measured death point) and on the new
      batch, which the EXECUTABLE contract below bounds (round-9 verdict
      ask #4): past ``BROADCAST_GUARD_MIN_NEW_ROWS`` new rows, a
      new/corpus row ratio above ``BROADCAST_NEW_RATIO_BOUND`` raises up
      front with a point-to-the-knob message instead of dying at the cap
      mid-job.
    - ``"shuffle"``: the same joins as shuffled SORT-MERGE joins. Pays
      corpus-sized shuffles (the docstring's never-shuffle promise is a
      broadcast-mode property), but SMJ spills instead of holding a hash
      relation per task — shuffled-HASH was tried first and fails the
      same corpus ("Can't acquire ... bytes to build hash relation": the
      candidate x shingle-array build side outgrows per-task execution
      memory exactly where the broadcast shape outgrew the driver). SMJ
      is linear and spill-safe at any |new| — the right plan whenever
      the delta grows with the corpus (split audits, backfills) rather
      than arriving as a bounded daily batch.
    """
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}: broadcast|shuffle")

    def _build_side(df: DataFrame) -> DataFrame:
        # broadcast: the new side lands whole on every executor.
        # shuffle: merge hint -> SMJ; both sides shuffle-partition on the
        # key and the join never materializes a whole-relation hash table.
        return F.broadcast(df) if strategy == "broadcast" else df.hint("merge")

    # The new batch's shingles are read by two consumers (banding, verify);
    # when built from RAW text here, materialize once so the Arrow
    # shingle kernel doesn't run per consumer. A PRECOMPUTED new_shingles
    # relation is the production shape (memoized checkpoint / parquet
    # store in every registered caller) — re-reading it per consumer is a
    # cached-blocks scan with no kernel, cheaper than paying an extra
    # materialization job per call (r11 measurement; the pre-r11 eager
    # checkpoint here cost ~0.3 s/run on the registered ingest query).
    new_sh = (
        new_shingles
        if new_shingles is not None
        else with_shingles(new_df, text_col, id_col).localCheckpoint(eager=True)
    )
    corp_sh = (
        corpus_shingles
        if corpus_shingles is not None
        else with_shingles(corpus_df, text_col, id_col)
    )
    if strategy == "broadcast":
        # Raising bounded-batch guard (see BROADCAST_NEW_RATIO_BOUND
        # above): a corpus-proportional "new" side must not reach the
        # 8 GiB broadcast ceiling mid-job.
        n_new = new_sh.count()
        if n_new > BROADCAST_GUARD_MIN_NEW_ROWS:
            n_corpus = (
                corpus_rows
                if corpus_rows is not None
                else (
                    corpus_shingles if corpus_shingles is not None else corpus_df
                ).count()
            )
            if n_corpus > 0 and n_new > BROADCAST_NEW_RATIO_BOUND * n_corpus:
                raise ValueError(
                    f"incremental_minhash_pairs(strategy='broadcast'): new "
                    f"side has {n_new} rows against a {n_corpus}-row corpus "
                    f"(ratio {n_new / n_corpus:.3f} > "
                    f"{BROADCAST_NEW_RATIO_BOUND}) — this is not a bounded "
                    "ingest batch, and Spark's hard 8 GiB broadcast cap "
                    "makes the broadcast shape fail at scale (measured: "
                    "the sf10 split-leakage audit). Pass "
                    "strategy='shuffle' for corpus-proportional deltas "
                    "(split audits, backfills) — same emitted pairs via "
                    "spill-safe sort-merge joins."
                )
    elif corpus_shingles is not None or corpus_rows is not None:
        # Partition-sizing guard on the SMJ shape (round-11 ask #5): the
        # verify join sorts corpus shingle-ARRAY rows, and the per-task
        # sort state OOMed at sf100ctl (5M rows / 32 partitions) while 128
        # partitions completed — SCALE.md "partition-sizing rule".
        # ``corpus_rows`` (or a conservative upper bound, e.g. the memo
        # store's total row count when the corpus is a slice of it) lets
        # stats-carrying callers skip the count entirely — zero Spark jobs
        # at construction (round-11 verdict ask #8). Only the
        # precomputed-shingles path ever counts: corpus_shingles is
        # memoized / parquet-backed in every production caller, so
        # count() is cheap, whereas counting a raw corpus_df here would
        # run the shingle kernel over the whole corpus just to maybe warn.
        warn_if_task_state_overflows(
            (corpus_shingles if corpus_shingles is not None else new_sh).sparkSession,
            corpus_rows if corpus_rows is not None else corpus_shingles.count(),
            SHINGLE_ARRAY_ROW_BYTES,
            "incremental minhash verify (SMJ sort state, corpus side)",
        )
    new_banded = (
        with_minhash_signature(new_sh)
        .withColumn("bk", F.explode(band_keys(F.col("mh"))))
        .select(F.col("doc_id").alias("new_id"), "bk")
    )
    corp_banded = (
        corpus_bands.select(F.col("doc_id").alias("corpus_id"), "bk")
        if corpus_bands is not None
        else with_minhash_signature(corp_sh)
        .withColumn("bk", F.explode(band_keys(F.col("mh"))))
        .select(F.col("doc_id").alias("corpus_id"), "bk")
    )
    candidates = (
        corp_banded.join(_build_side(new_banded), "bk")
        .select("new_id", "corpus_id")
        .distinct()
    )
    # Verify-join ORDER (r11 restructure, guide-§8 shape: decide with small
    # rows, attach heavy arrays map-side): the SKINNY candidate pair list
    # (16 B/row) joins the corpus scan FIRST, then the batch-bounded
    # new-side arrays attach per candidate. The pre-r11 shape broadcast
    # candidates⋈new_sh — |candidates| rows EACH carrying a shingle ARRAY —
    # so a dup-heavy corpus made the broadcast BYTES corpus-proportional
    # (measured via gate_batch_served: ~350 MB at 500k candidates, death at
    # spark.driver.maxResultSize at 1.5M), and guarding it required an
    # EAGER candidate materialization + count on every call (+~2 s/run on
    # the registered bench query). With only the array-free pair list
    # broadcast, the same 1.5M-candidate corpus broadcasts ~24 MB: the
    # array-width fan-out hazard is gone structurally (the 8 GiB / 512M-row
    # broadcast cap moves ~100x out, past where strategy='shuffle' is the
    # documented choice anyway), so that guard and its per-call jobs are
    # deleted rather than cheapened. Under 'broadcast' both joins stay
    # map-side on the corpus; under 'shuffle' the same two SMJs run merely
    # reordered (corpus_id first, then new_id) — identical bytes moved.
    cand_with_corp = corp_sh.select(
        F.col("doc_id").alias("corpus_id"), F.col("sh").alias("sh_corp")
    ).join(_build_side(candidates), "corpus_id")
    return (
        cand_with_corp.join(
            _build_side(
                new_sh.select(
                    F.col("doc_id").alias("new_id"), F.col("sh").alias("sh_new")
                )
            ),
            "new_id",
        )
        .withColumn("n_common", F.size(F.array_intersect("sh_new", "sh_corp")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("sh_new") + F.size("sh_corp") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "n_common", "jaccard")
    )
