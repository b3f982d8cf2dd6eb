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


def md5_prefix_long(key: Column, hex_chars: int, start: int = 1) -> Column:
    """BIGINT from ``hex_chars`` hex digits of md5(key), starting at the
    1-based ``start`` digit — THE cross-engine hash primitive (md5 is md5
    on every engine, unlike xxhash64). Mirrors DuckDB
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), start, hex_chars))::BIGINT``.
    Keep ``hex_chars`` <= 15 so the value stays under 2^60 (BIGINT-safe).
    The string cast is a no-op for string inputs, so string-keyed callers
    produce the same bytes they always did."""
    return F.conv(
        F.substring(F.md5(key.cast("string").cast("binary")), start, hex_chars),
        16,
        10,
    ).cast("long")


def hash_bucket(key: Column, buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): 56-bit md5 prefix mod buckets.
    Mirrors DuckDB ('0x' || substr(md5(key), 1, 14))::BIGINT % buckets."""
    return (md5_prefix_long(key, 14) % buckets).cast("int")


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


# --- cross-engine fixed-point log2 -------------------------------------------
#
# The Efraimidis-Spirakis priority needs a logarithm, and libm logarithms
# are the one basic operation IEEE does NOT pin down: Spark's JVM
# Math.log and DuckDB's C libm can disagree in the last ulp, which flips
# a selection boundary and breaks cross-engine reproducibility (why this
# sampler was registered rows-only through round 5). The fix is the same
# device as the Q30 money convention and the CMS md5 hashing: do the
# transcendental step in INTEGER arithmetic that both engines define
# identically. floor(log2(h) * 2^20) via exponent extraction + 20 rounds
# of mantissa squaring — shifts, multiplies and compares only.

LOG2FP_FRAC_BITS = 20
LOG2FP_HASH_BITS = 48  # md5-prefix width: 2^48 fits BIGINT with squaring room


def with_log2fp_many(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Append, for each ``(h_col, out_col)`` pair,
    ``out_col`` = floor(log2(h) * 2**LOG2FP_FRAC_BITS) for a BIGINT
    column ``h`` in [1, 2**48] — exact integer arithmetic, so any engine
    that runs the same steps produces the same bits.

    Algorithm (per pair): e = floor(log2 h) by a 48-way range CASE;
    mantissa normalized to t in [2^30, 2^31) by shifts; then the classic
    square-and-extract loop — s = t*t lands in [2^60, 2^62), s >= 2^61
    means the squared mantissa crossed 2 (fraction bit 1, renormalize by
    >>31), else bit 0 (>>30). 20 rounds give 20 fraction bits; absolute
    error on log2 stays under ~3·2^-20 (the truncating renormalization
    accumulates a couple of ulps beyond the quantization floor — the spec
    test pins 3e-6), and the map is weakly monotone in h (floor of a
    monotone function), so rank uses downstream are order-safe.

    All pairs run INTERLEAVED through the same few projections: each
    DataFrame op re-analyzes the whole lineage, so driver-side build time
    is quadratic in op count — 20 chained selects measured ~4x the wall
    of the grouped form on a bench-style build+run (1.83s -> 0.48s at
    sf0.1), and a query taking four logs pays four chains unless they
    share. Lateral column aliases keep every step a single named
    projection (a nested expression would be inlined 3^20-fold by
    projection collapse). Spark-side grouping does not affect values —
    the steps are the same integer ops in the same order per pair, which
    is what the DuckDB rendering (log2fp_sql) and the pure-Python spec
    (tests/test_skew.py) pin.

    Scale: map-only column expressions — ~60 integer ops/row per pair,
    no shuffle, no UDF. Claims every ``_l2*`` column name while running
    (raises on collision).
    """
    outs = [o for _, o in pairs]
    clash = sorted(
        {c for c in df.columns if c.startswith("_l2")}
        | {o for o in outs if o in df.columns}
    )
    if clash or len(set(outs)) != len(outs):
        raise ValueError(
            f"with_log2fp: reserved/colliding column(s) {clash or outs}; "
            "the chain claims every '_l2*' name and each output name — "
            "rename them first; silently overwriting would corrupt the "
            "caller's data"
        )
    payload = list(df.columns)
    # One init projection: exponent CASE, then mantissa + zero accumulator
    # referencing it laterally.
    init = ["*"]
    for i, (h_col, _) in enumerate(pairs):
        ecase = (
            "CASE "
            + " ".join(
                f"WHEN {h_col} >= {1 << exp} THEN {exp}"
                for exp in range(47, -1, -1)
            )
            + " END"
        )
        init.append(f"CAST({ecase} AS BIGINT) AS _l2{i}e")
        init.append(f"shiftright(shiftleft({h_col}, 47 - _l2{i}e), 17) AS _l2{i}t")
        init.append(f"CAST(0 AS BIGINT) AS _l2{i}f")
    df = df.selectExpr(*init)
    carried = [f"_l2{i}e" for i in range(len(pairs))]
    done = 0
    while done < LOG2FP_FRAC_BITS:
        k = min(10, LOG2FP_FRAC_BITS - done)
        exprs = ["*"]
        finals: list[tuple[str, str, str]] = []  # (pair idx, last t, last f)
        for i in range(len(pairs)):
            pt, pf = f"_l2{i}t", f"_l2{i}f"
            for j in range(k):
                exprs.append(f"{pt} * {pt} AS _l2{i}s{j}")
                exprs.append(
                    f"CASE WHEN _l2{i}s{j} >= {1 << 61} THEN shiftright(_l2{i}s{j}, 31) "
                    f"ELSE shiftright(_l2{i}s{j}, 30) END AS _l2{i}t{j}"
                )
                exprs.append(
                    f"{pf} * 2 + (CASE WHEN _l2{i}s{j} >= {1 << 61} THEN 1 ELSE 0 END) "
                    f"AS _l2{i}f{j}"
                )
                pt, pf = f"_l2{i}t{j}", f"_l2{i}f{j}"
            finals.append((str(i), pt, pf))
        df = df.selectExpr(*exprs).selectExpr(
            *payload,
            *carried,
            *[f"{pt} AS _l2{i}t" for i, pt, _ in finals],
            *[f"{pf} AS _l2{i}f" for i, _, pf in finals],
        )
        done += k
    outs_exprs = [
        f"CAST(CASE WHEN {h_col} >= {1 << 48} THEN {48 << LOG2FP_FRAC_BITS} "
        f"ELSE _l2{i}e * {1 << LOG2FP_FRAC_BITS} + _l2{i}f END AS BIGINT) "
        f"AS {out_col}"
        for i, (h_col, out_col) in enumerate(pairs)
    ]
    return df.selectExpr(*payload, *outs_exprs)


def with_log2fp(df: DataFrame, h_col: str, out_col: str) -> DataFrame:
    """Single-column convenience wrapper over ``with_log2fp_many``."""
    return with_log2fp_many(df, [(h_col, out_col)])


def log2fp_sql(payload_sql: str, out_col: str = "l2fp", prefix: str = "l2") -> str:
    """The DuckDB rendering of the SAME fixed-point log2: a CTE chain to
    splice into an oracle query. ``payload_sql`` must yield a BIGINT
    column ``h`` (in [1, 2**48]) plus any payload columns; the returned
    text is a complete WITH body whose final CTE ``{prefix}fin`` exposes
    the payload and ``out_col`` (the working columns ``h``, ``e``, ``t``,
    ``f`` are EXCLUDEd — payload columns must not use those names). Both
    renderings are generated from the same constants so the engines move
    in lockstep by construction. Give each application a distinct
    ``prefix`` to take several logs in one query (e.g. log2 of a count
    and of its total for an entropy ratio).
    """
    ecase = (
        "CASE "
        + " ".join(f"WHEN h >= {1 << exp} THEN {exp}" for exp in range(47, -1, -1))
        + " END"
    )
    steps = ",\n".join(
        f"{prefix}s{i + 1} AS (SELECT * REPLACE ("
        f"CASE WHEN t*t >= {1 << 61} THEN (t*t) >> 31 ELSE (t*t) >> 30 END AS t, "
        f"f*2 + (CASE WHEN t*t >= {1 << 61} THEN 1 ELSE 0 END) AS f) FROM {prefix}s{i})"
        for i in range(LOG2FP_FRAC_BITS)
    )
    return f"""
{prefix}w AS ({payload_sql}),
{prefix}n AS (SELECT *, {ecase} AS e FROM {prefix}w),
{prefix}s0 AS (SELECT *, (h << (47 - e)) >> 17 AS t, CAST(0 AS BIGINT) AS f FROM {prefix}n),
{steps},
{prefix}fin AS (
  SELECT * EXCLUDE (h, e, t, f),
         CASE WHEN h >= {1 << 48} THEN {48 << LOG2FP_FRAC_BITS}
              ELSE (e << {LOG2FP_FRAC_BITS}) + f END AS {out_col}
  FROM {prefix}s{LOG2FP_FRAC_BITS}
)"""


def weighted_sample_without_replacement(
    df: DataFrame, weight_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row gets priority u^(1/w) for a deterministic
    hash-uniform u in (0,1]; the k largest priorities are the sample, and
    inclusion probabilities follow the successive-weighted-draw model the
    Bernoulli sampler (weighted_bernoulli_sample) cannot express — that one
    fixes RATE, this one fixes SIZE.

    Implemented on the equivalent log scale: maximizing u^(1/w) is
    minimizing (48 - log2 h)/w for h = 48-bit md5 prefix of the key + 1
    (u = h/2^48). log2 is the quantized integer ``with_log2fp`` — NOT
    libm ln(), whose last-ulp engine differences flip selection
    boundaries — and the final ratio is one IEEE double division, which
    (unlike ln) is correctly rounded on every engine, so the selected set
    is bit-reproducible across Spark, DuckDB, runs, and partitionings.
    The 2^-20 log quantization perturbs inclusion odds by <1e-6
    relative — far below the sampling noise of any real draw.

    Scale: a map pass to compute priorities + TakeOrdered(k) — no shuffle
    of the data, no per-group state; k rows to the driver.

    Rows with non-positive weight are EXCLUDED up front: w=0 would divide
    by zero (an ANSI-mode error in Spark 4), and w<0 would flip the
    priority's sign and outrank every valid row — neither has a sampling
    interpretation. NULL keys are excluded too: no hash identity, and the
    engines disagree on NULL ordering defaults.
    """
    reserved = [c for c in ("_espk_h", "_priority") if c in df.columns]
    if reserved:
        raise ValueError(
            f"weighted_sample_without_replacement: input already has "
            f"reserved column(s) {reserved}; rename them first"
        )
    h = md5_prefix_long(F.col(key_col), 12) + 1
    base = (
        df.filter((F.col(weight_col) > 0) & F.col(key_col).isNotNull())
        .withColumn("_espk_h", h)
    )
    base = with_log2fp(base, "_espk_h", "_priority_l2")
    neg_log2_u = F.lit(48 << LOG2FP_FRAC_BITS) - F.col("_priority_l2")
    priority = neg_log2_u.cast("double") / F.col(weight_col).cast("double")
    return (
        base.withColumn("_priority", priority)
        .orderBy(F.col("_priority").asc(), F.col(key_col))
        .limit(k)
        .drop("_espk_h", "_priority_l2", "_priority")
    )
