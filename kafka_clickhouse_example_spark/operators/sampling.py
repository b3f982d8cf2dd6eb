"""Deterministic sampling and dataset splitting for training-data pipelines.

Seed-based ``df.sample`` is engine- and partitioning-dependent — useless when
a 100 TB corpus must be re-materializable bit-for-bit months later. The
standard fix is *hash-based* selection: a row is in the sample iff
``h(stable_key) mod D < k``. Properties:

- reproducible on any engine/partitioning (md5 is md5 everywhere),
- stable under corpus growth (existing rows never change buckets),
- stratifiable by computing the threshold per stratum,
- trivially auditable in SQL — hence fully oracle-checkable.

The same construction assigns train/val/test splits: bucket = h(key) mod 100
-> [0,80) train, [80,90) val, [90,100) test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 100


def hash_bucket(key: Column, buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): 56-bit md5 prefix mod buckets.
    Mirrors DuckDB ('0x' || substr(md5(key), 1, 14))::BIGINT % buckets."""
    h = F.conv(F.substring(F.md5(key.cast("string").cast("binary")), 1, 14), 16, 10).cast(
        "long"
    )
    return (h % buckets).cast("int")


def deterministic_sample(
    df: DataFrame, key_col: str, percent: int, buckets: int = SPLIT_BUCKETS
) -> DataFrame:
    """Keep ~percent% of rows, chosen by key hash — same rows every run,
    every engine, every partitioning."""
    return df.filter(hash_bucket(F.col(key_col), buckets) < percent)


def with_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    out: str = "split",
) -> DataFrame:
    """Assign 'train'/'val'/'test' by hash bucket. Disjoint, exhaustive,
    stable under appends (a row's split never changes as the corpus grows)."""
    b = hash_bucket(F.col(key_col))
    return df.withColumn(
        out,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


RATE_BUCKETS = 10_000  # rate resolution for the proportional samplers


def balanced_sample(df: DataFrame, stratum_col: str, key_col: str) -> DataFrame:
    """Stratified downsampling to (approximately) the smallest stratum:
    every stratum keeps ``(RATE_BUCKETS * min_count) div count`` per-10k of
    its rows, selected by the same engine-stable key hash as
    ``deterministic_sample``.

    The per-stratum rate is exact integer arithmetic on two aggregate
    counts — no float rounding to diverge between engines — and the stratum
    rate table is a broadcast (one row per stratum). Resolution is 1/10,000
    (same as temperature_sample, for the same reason): at 100-bucket
    resolution any stratum more than 100x the smallest floored to rate 0
    and silently VANISHED from the "balanced" sample instead of being
    downsampled (review finding). A stratum beyond 10,000x still floors to
    0 — the resolution bound is documented, not hidden.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_stratum"))
    min_n = counts.agg(F.min("n_stratum").alias("min_n"))
    rates = (
        counts.crossJoin(F.broadcast(min_n))
        .select(
            stratum_col,
            F.expr(f"({RATE_BUCKETS} * min_n) div n_stratum").alias("rate"),
        )
    )
    return df.join(F.broadcast(rates), stratum_col).filter(
        hash_bucket(F.col(key_col), RATE_BUCKETS) < F.col("rate")
    )


def weighted_bernoulli_sample(df: DataFrame, weight_col: str, key_col: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling: P(keep) = weight / max(weight),
    realized as ``hash_bucket(key, 10000) < (10000 * weight) div max_weight``
    — exact integer arithmetic end to end (no pow()/ln() reservoir keys,
    whose libm rounding differs between engines), so the selected set is
    reproducible anywhere and append-stable while max(weight) is unchanged.

    Resolution is 1/10,000: at 100 buckets, one heavy-tailed outlier weight
    made every row under max/100 DETERMINISTICALLY unsampleable (rate 0,
    not merely unlikely — review finding). Rows under max/10,000 still
    floor to 0; that bound is the documented trade of integer rates.

    Scale: one max() aggregate broadcast back onto a scan-parallel filter;
    the corpus is never shuffled. Quality-weighted corpus selection for
    training pipelines is exactly this shape.
    """
    max_w = df.agg(F.max(F.col(weight_col)).alias("_max_w"))
    return (
        df.crossJoin(F.broadcast(max_w))
        .filter(
            hash_bucket(F.col(key_col), RATE_BUCKETS)
            < F.expr(f"({RATE_BUCKETS} * {weight_col}) div _max_w")
        )
        .drop("_max_w")
    )


def with_token_quota(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    weight_col: str = "n_tokens",
    order_cols: list[str] | None = None,
    before_col: str = "tokens_before",
) -> DataFrame:
    """Per-group token-budget quota: walk each group in a deterministic
    order and keep rows until the group's token budget is spent.

    This is domain/source quota curation — pretraining mixes cap each
    source at a token budget rather than a document count, so the cut must
    be by cumulative token mass in a reproducible order. Boundary rule: a
    row is kept iff the tokens consumed BEFORE it are under budget (the
    first row crossing the boundary is kept in full — matching
    concat-and-split trainers, which never see partial documents until the
    final chunk).

    Scale: one shuffle partitioning by ``group_col``; the running sum is a
    streaming window frame (ROWS UNBOUNDED PRECEDING — spill-safe, no
    buffering of the partition). Per-group sequential semantics pin each
    group to one task by definition; a group so large that even its
    *scan* skews the stage should be quota'd hierarchically (sub-source
    keys) — the budget arithmetic composes.
    """
    from pyspark.sql import Window

    order_cols = order_cols or ["doc_id"]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(weight_col)).over(w), F.lit(0)).cast("long")
    return df.withColumn(before_col, cum_before).filter(
        F.col(before_col) < F.lit(budget)
    )


TEMPERATURE_BUCKETS = 10000


def temperature_sample(
    df,
    stratum_col: str,
    key_col: str,
    buckets: int = TEMPERATURE_BUCKETS,
    keep_stats: bool = False,
):
    """Temperature-balanced (τ=2) stratum sampling — the standard
    multilingual-corpus rebalancing rule (sample source s with probability
    ∝ p_s^(1/τ)), realized with NO floating randomness: expected kept mass
    per stratum ∝ sqrt(count_s), implemented as keep-if
    hash_bucket(key) < rate_s with

        rate_s = (buckets · isqrt(count_min)) div isqrt(count_s)

    so the smallest stratum keeps everything and a stratum k× larger keeps
    ~1/sqrt(k) of its rows. isqrt = floor∘sqrt on BIGINT-exact doubles —
    IEEE sqrt is correctly rounded, so both engines floor the same value;
    the rate division is integer `div`. Deterministic under appends per
    stratum composition (a row's bucket never changes; rates move only
    when counts do).

    Scale: the rate table is |strata|-sized and broadcast; the filter is
    map-side over the scan — no shuffle of the corpus.

    Returns the input schema (like every sampler here); ``keep_stats=True``
    additionally exposes the per-stratum ``_n`` (original count) and
    ``_rate`` columns for report queries.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    mn = counts.agg(F.min("_n").alias("_mn"))
    rates = (
        counts.crossJoin(F.broadcast(mn))
        .withColumn("_isq_n", F.floor(F.sqrt(F.col("_n").cast("double"))).cast("long"))
        .withColumn(
            "_isq_mn", F.floor(F.sqrt(F.col("_mn").cast("double"))).cast("long")
        )
        .withColumn("_rate", F.expr(f"(cast({buckets} as bigint) * _isq_mn) div _isq_n"))
        .select(stratum_col, "_n", "_rate")
    )
    kept = df.join(F.broadcast(rates), stratum_col).filter(
        hash_bucket(F.col(key_col), buckets) < F.col("_rate")
    )
    return kept if keep_stats else kept.drop("_n", "_rate")


def weighted_sample_without_replacement(
    df: DataFrame, weight_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row gets priority u^(1/w) for a deterministic
    hash-uniform u in (0,1); the k largest priorities are the sample, and
    inclusion probabilities follow the successive-weighted-draw model the
    Bernoulli sampler (weighted_bernoulli_sample) cannot express — that one
    fixes RATE, this one fixes SIZE.

    Implemented on the equivalent log scale (ln(u)/w, larger is better:
    ln(u) < 0 so dividing by a larger weight moves the key toward 0) to
    avoid pow() underflow for tiny weights. u derives from xxhash64 of the
    key column — deterministic across runs, partitionings, and cluster
    sizes.

    Scale: a map pass to compute priorities + TakeOrdered(k) — no shuffle
    of the data, no per-group state; k rows to the driver.

    Rows with non-positive weight are EXCLUDED up front: w=0 would divide
    by zero (an ANSI-mode error in Spark 4), and w<0 would flip the
    priority's sign and outrank every valid row — neither has a sampling
    interpretation.
    """
    # 53-bit mantissa-sized uniform in (0, 1]; +1 avoids ln(0)
    u = (F.pmod(F.xxhash64(F.col(key_col)), F.lit(1 << 53)) + 1) / float(1 << 53)
    priority = F.ln(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_priority", priority)
        .orderBy(F.col("_priority").desc(), F.col(key_col))
        .limit(k)
        .drop("_priority")
    )
