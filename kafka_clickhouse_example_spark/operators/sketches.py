"""Count-Min sketch: mergeable heavy-hitter frequency estimation.

Completes the engine's mergeable-sketch family (HLL distinct counts, theta
set algebra, KLL quantiles — see plans/queries_analytics.py) with the
classic frequency sketch (Cormode & Muthukrishnan 2005): a depth x width
counter matrix where row r increments cell hash_r(key) % width; the
estimate for a key is the MIN over rows of its cells. Estimates never
undercount, and overcount by more than (e/width)*N with probability at most
exp(-depth) — with fixed hash seeds on fixed data the sketch is fully
deterministic.

Spark-first design: the sketch is a SPARSE DataFrame of (r, idx, cnt)
cells — groupBy aggregation gives map-side partial counting for free, and
a 4x2048 sketch is at most 8,192 rows regardless of input size, so sketch
construction is one shuffle of bounded width and merging partials (e.g.
per-day sketches) is a union + re-aggregate of KB-scale relations. Probing
broadcasts the (tiny) sketch against the probe keys. Row hashes are the
Kirsch-Mitzenmacher family (h1 + r*h2) mod width over the two 56-bit md5
halves (operators/dedup.md5_half) — one md5 per row, all JVM-side, and
engine-portable, so the whole sketch is SQL-expressible and the registered
query carries a DuckDB oracle (same device the minhash/bootstrap oracles
certify).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.dedup import md5_half

CMS_DEPTH = 4
CMS_WIDTH = 2048

# KMV (k-minimum-values / bottom-k) distinct sketch — the engine-portable
# member of the distinct-count family (built-in HLL++/Datasketches remain
# in the contract tests; their estimates are engine-specific, so queries
# that need a DuckDB oracle use this sketch instead). The sketch of a key
# set is the k SMALLEST distinct 56-bit md5-half hashes; with fewer than k
# distinct hashes it degenerates to the exact distinct set (theta-style
# "exact mode"). Estimator (Bar-Yossef et al. 2002): n_hat =
# (k-1) * |hash space| / h_(k) — one integer-valued double product and one
# division, no libm, so both engines produce the bit-identical double.
# Mergeable exactly: bottom-k of a union == bottom-k of the unioned
# bottom-k sets (min-wise), which the sketch-merge query certifies.
# k=128: ~9% relative error (1/sqrt(k-2)); sized so the driver's sf0.01
# gate (150 distinct users) exercises the ESTIMATOR branch, not just the
# below-k exact mode — the formula itself gets hash-certified.
KMV_K = 128
_KMV_SPACE = float(1 << 56)  # exact power-of-two double


def kmv_hash(key) -> "F.Column":
    """56-bit md5-half hash of the key's string form (same bytes both
    engines hash: md5(CAST(key AS VARCHAR)))."""
    return md5_half(key.cast("string"), 0)


def kmv_build(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """Global bottom-k sketch: one column ``h`` with at most k rows.

    distinct -> orderBy().limit(k) plans as TakeOrderedAndProject (per-
    partition top-k + driver merge of P*k rows), never a global sort —
    the 100 TB shape: the full distinct-hash relation is reduced map-side.
    """
    return (
        df.select(kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


# Salt width for the two-phase grouped bottom-k: phase 1 ranks within
# (group, h mod SALT) cells — parallelism groups x SALT — and keeps k per
# cell, so phase 2's per-group window sees at most SALT*k rows, bounded
# regardless of group cardinality.
KMV_SALT = 32


def kmv_build_grouped(
    df: DataFrame, group_cols: list[str], key_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group bottom-k sketches: (group_cols..., h), <= k rows per group.

    Bottom-k is decomposable (the k smallest of a union are among the k
    smallest of each part), so this runs as a salted TWO-PHASE rank.
    Spark's InferWindowGroupLimit already pre-cuts any rank-limit window
    to k rows per group PER UPSTREAM PARTITION (Partial WindowGroupLimit
    before the exchange — verified in this plan), so even a single
    per-group window never streams a group's full 1e9 distinct hashes
    through one task; but its final task still processes min(D_g, P*k)
    rows, which GROWS with the cluster's partition count P (P=1e5, k=128
    -> 12.8M rows through one task per group). Phase 1 here ranks
    (group, h mod KMV_SALT) cells — KMV_SALT-way parallel per group, each
    cell seeing ~D_g/KMV_SALT of the data — and phase 2's per-group task
    is bounded at KMV_SALT*k rows INDEPENDENT of P. Equivalence with the
    naive window is pinned by tests/test_sketches.py.
    """
    # Reserved internal names: fail with the real cause instead of a
    # duplicate-column AnalysisException ('h') or a silently-dropped group
    # key ('_rn') — the same guard ranking/packing grew for ADVICE r5.
    clashes = {"h", "_rn"} & set(group_cols)
    if clashes:
        raise ValueError(
            f"kmv_build_grouped: group column(s) {sorted(clashes)} clash "
            "with reserved internal names ('h', '_rn') — rename them "
            "before sketching"
        )
    hashed = df.select(
        *group_cols, kmv_hash(F.col(key_col)).alias("h")
    ).distinct()
    w1 = Window.partitionBy(*group_cols, F.pmod(F.col("h"), F.lit(KMV_SALT))).orderBy(
        "h"
    )
    local = (
        hashed.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        local.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(sketches: list[DataFrame], k: int = KMV_K) -> DataFrame:
    """Union partial sketches and re-take the bottom-k: exactly the sketch
    of the unioned key sets (min-wise property)."""
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.select("h").distinct().orderBy("h").limit(k)


def kmv_estimate_col(n_hashes, kth_hash, k: int = KMV_K) -> "F.Column":
    """Distinct-count estimate as a Column, given the sketch's row count
    and its largest (= k-th smallest overall) hash.

    Exact mode below k distinct hashes; otherwise (k-1)*SPACE/h_k.
    (k-1)*SPACE is a product of an exact small int and an exact power of
    two (<= 8 + 1 mantissa bits), the int64->double conversions and the
    division are IEEE round-to-nearest — bit-identical in Spark and DuckDB.
    """
    est = F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / kth_hash.cast("double")
    return F.when(n_hashes < k, n_hashes.cast("double")).otherwise(est)


def _cell_array(key, depth: int, width: int):
    """(r, idx) struct array for one key: idx_r = (h1 + r*h2) % width with
    h1/h2 the md5 halves of the key's string form — computed ONCE per row,
    shared by all depth cells. h1 + r*h2 < 2^56 + depth*2^56 stays far
    from int64 overflow, and both terms are non-negative so Spark % and
    DuckDB % agree."""
    h1 = md5_half(key.cast("string"), 0)
    h2 = md5_half(key.cast("string"), 1)
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                ((h1 + F.lit(r) * h2) % F.lit(width)).alias("idx"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sparse sketch: one (r, idx, cnt) row per touched cell.

    One pass over the input: each row fans out to ``depth`` cells via an
    inline array (no join, no extra scan), then a bounded-cardinality
    groupBy (<= depth*width groups) with map-side partials.
    """
    cells = _cell_array(F.col(key_col), depth, width)
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.idx").alias("idx"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge partial sketches (same depth/width/seeds): cell-wise sum.

    CMS merge is exact: merge(build(A), build(B)) == build(A union B)
    cell-for-cell, which tests assert as frame equality.
    """
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("r", "idx").agg(F.sum("cnt").alias("cnt"))


def cms_probe(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimate each probe key's frequency: min over rows of its cells.

    The sketch side is bounded (depth*width rows) so Spark broadcasts it;
    a probe key hashing into a never-touched cell scores 0 via the left
    join's coalesce — correct, since absence proves count 0 for that row.
    """
    cells = _cell_array(F.col(key_col), depth, width)
    probe_cells = probes.select(key_col, F.explode(cells).alias("c")).select(
        key_col, F.col("c.r").alias("r"), F.col("c.idx").alias("idx")
    )
    joined = probe_cells.join(F.broadcast(sketch), ["r", "idx"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cell_cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cell_cnt").alias("est_n"))


# Hash-sampled quantile (HSQ) sketch — the engine-portable member of the
# rank/quantile sketch family (built-in Datasketches KLL remains in the
# contract tests; its compactor consumes a random bit per compaction, so
# its state — and therefore its quantile answers — cannot be rebuilt in
# SQL). HSQ replaces KLL's random level compactor with a CONTENT HASH:
# a row survives to the sketch iff its 56-bit md5-half hash is divisible
# by 2^T, where the level threshold T is the smallest integer with
# ceil(n / HSQ_K) <= 2^T (n = exact input count). Every retained row then
# represents 2^T input rows, so the rank of value v is estimated by
# (# retained <= v) * 2^T — and because the factor is constant, quantile
# extraction reduces to plain counting ranks over the ~HSQ_K retained
# rows. Determinism: survival depends only on row content, never on
# arrival order or partitioning — the sketch is exactly layout-insensitive
# (KLL's documented relayout exception does not apply) and cell-for-cell
# reproducible in DuckDB SQL.
#
# Mergeable EXACTLY, the KMV argument transposed: a per-group sketch at
# local threshold T_g contains every row with h % 2^T_g == 0; the global
# threshold T >= T_g (n >= n_g, T monotone in n), and divisibility by 2^T
# implies divisibility by 2^T_g — so filtering the UNION of group sketches
# by the global threshold yields byte-identically the direct whole-input
# sketch. Store per-day sketches + exact counts, answer any date range's
# quantiles by re-threshold + rank — the percentile-matview pattern with
# O(HSQ_K) state per partition.
#
# Accuracy: retained count m is in (HSQ_K/2, HSQ_K] in expectation; the
# estimated rank of the q-quantile has standard error sqrt(q(1-q)/m)
# (Bernoulli sampling), ~1.6% at q=0.5 with HSQ_K=1024. Tests pin the
# observed rank error with 3-sigma headroom.
HSQ_K = 1024


def _hsq_threshold_sql(n: str) -> str:
    """SQL (shared dialect) for the level threshold T given a BIGINT count
    expression ``n``: T = bit_length(m - 1) with m = ceil(n / HSQ_K), via
    the binary-string length of m-1 (no libm, no float log2 edge cases at
    exact powers of two)."""
    m = f"(({n} + {HSQ_K - 1}) div {HSQ_K})"
    return f"CASE WHEN {m} <= 1 THEN 0 ELSE length(bin({m} - 1)) END"


def hsq_hash(key) -> "F.Column":
    """The sketch's survival hash: 56-bit md5-half of the key's string
    form — the same construction (and therefore the same SQL rebuild,
    ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 14))::BIGINT) as kmv_hash.
    The key must uniquely identify a row (e.g. event_id): hashing the
    VALUE would collapse duplicates and under-weight them."""
    return md5_half(key.cast("string"), 0)


def hsq_build_grouped(
    df: DataFrame, group_cols: list[str], value_col: str, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """Per-group sketches: returns (sketch, counts) where sketch is
    (group_cols..., v, h) — the retained rows at each group's local
    threshold — and counts is (group_cols..., n) with the group's EXACT
    row count (the metadata a stored sketch must carry for re-threshold
    merges and for exact n in estimates).

    NULL values are excluded up front — from the sketch AND from the
    counts — so quantiles are over the non-NULL domain and ``n`` counts
    non-NULL rows: the Datasketches-KLL semantics (its update skips
    nulls), and the only semantics both engines can agree on (Spark
    windows sort NULLS FIRST, DuckDB NULLS LAST — retained NULLs would
    shift every cumulative rank differently per engine).

    Shape: one groupBy for the counts (map-side combined, one row per
    group), the thresholds broadcast back, then a map-only filter — the
    sketch build never shuffles the data rows themselves."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col).alias("v"),
        hsq_hash(F.col(key_col)).alias("h"),
    )
    counts = base.groupBy(*group_cols).agg(F.count("*").cast("bigint").alias("n"))
    thr = counts.select(*group_cols, F.expr(_hsq_threshold_sql("n")).alias("t"))
    sketch = (
        base.join(F.broadcast(thr), group_cols)
        .filter(F.expr("h % shiftleft(CAST(1 AS BIGINT), t) = 0"))
        .select(*group_cols, "v", "h")
    )
    return sketch, counts


def hsq_merge_quantiles(
    sketch: DataFrame, counts: DataFrame, quantiles: dict[str, tuple[int, int]]
) -> DataFrame:
    """Merge per-group sketches and read quantiles: one output row with a
    double column per requested quantile plus exact ``n_values``.

    ``quantiles`` maps output column name -> (num, den) with q = num/den;
    the rank target is computed in INTEGERS — ceil(q * m) = (num*m +
    den-1) div den over the retained count m — so both engines pick the
    identical retained row (no float rank boundary). The global threshold
    comes from the exact total count (sum of stored per-group counts); the
    re-filter h % 2^T == 0 realizes the exact-merge property documented
    above. Cost: the merge touches only O(groups * HSQ_K) stored rows; the
    final rank window runs over <= ~HSQ_K survivors."""
    # coalesce: sum over an empty counts relation is NULL, but an empty
    # input's stream length is 0 (and the oracle's count(...) agrees)
    total = counts.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_total")
    )
    thr = total.select(
        "n_total", F.expr(_hsq_threshold_sql("n_total")).alias("t")
    )
    kept = (
        sketch.crossJoin(F.broadcast(thr))  # 1-row threshold frame
        .filter(F.expr("h % shiftleft(CAST(1 AS BIGINT), t) = 0"))
        .select("v")
    )
    byv = kept.groupBy("v").agg(F.count("*").cast("bigint").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = byv.withColumn("cw", F.sum("c").over(w)).withColumn(
        "m", F.sum("c").over(Window.partitionBy())
    )
    aggs = [
        F.min(
            F.when(
                F.col("cw")
                >= F.expr(f"(CAST({num} AS BIGINT) * m + {den - 1}) div {den}"),
                F.col("v"),
            )
        ).alias(name)
        for name, (num, den) in quantiles.items()
    ]
    # n_values from the exact counts frame (not the retained rows), so it
    # is right even for an empty sketch
    return cum.groupBy().agg(*aggs).crossJoin(
        F.broadcast(total.select(F.col("n_total").alias("n_values")))
    )
