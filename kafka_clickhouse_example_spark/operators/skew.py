"""Skew-mitigation operators: salted two-stage aggregation and salted
broadcast-replicated joins.

At 100 TB a handful of heavy-hitter keys (one chatty host pair, one viral
user) can pin a single reducer while the rest of the cluster idles. Two
standard remedies, expressed as reusable plan shapes:

- **Salted aggregation**: split each key into ``n_salts`` sub-keys, partially
  aggregate per (key, salt) — spreading one hot key over n reducers — then
  combine the partials. Correct for any decomposable aggregate (sum, count,
  min, max); DECIMAL sums keep the two-stage result bit-identical to the
  one-stage plan.
- **Salted join**: replicate the *small* side n_salts times (one copy per
  salt), salt the big side's key randomly-but-deterministically, and join on
  (key, salt) — each hot key's rows spread over n partitions. Only needed
  when the small side is too big to broadcast outright but the big side has
  hot keys; with a broadcastable small side, plain ``broadcast()`` already
  avoids the skewed shuffle entirely.

AQE's skew-join splitting (enabled in session.py) handles *detected* skew at
runtime; explicit salting remains the tool for aggregation skew and for
joins whose skew AQE can't see (e.g. post-explode misestimates, streaming
state).

Determinism: the salt is ``pmod(hash-of-unique-column, n)`` — stable across
runs — and salting never changes results, only placement; oracle SQL for a
salted query is the plain unsalted aggregate.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Callable[[str], Column], Callable[[str], Column]]],
    salt_col: Column,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partials`` maps output column -> (input column, stage1 aggregate over
    the input column, stage2 combiner over the stage-1 partial). E.g.::

        {"total": ("value", lambda c: F.sum(F.col(c).cast(DEC)), F.sum),
         "n":     ("value", F.count, F.sum)}

    ``salt_col`` must be a deterministic expression over input columns (a
    unique id pmod'ed), so re-runs place rows identically.
    """
    stage1 = df.withColumn("_salt", F.pmod(salt_col, F.lit(n_salts))).groupBy(
        *keys, "_salt"
    )
    s1 = stage1.agg(
        *[fn1(src).alias(f"_p_{name}") for name, (src, fn1, _) in partials.items()]
    )
    return s1.groupBy(*keys).agg(
        *[fn2(f"_p_{name}").alias(name) for name, (_, _, fn2) in partials.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_col: Column,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side by replicating the small side
    across ``n_salts`` salts. ``salt_col`` salts the big side (deterministic
    expression over its columns)."""
    big_salted = big.withColumn("_salt", F.pmod(salt_col, F.lit(n_salts)))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_rep, [key, "_salt"], how)
    return out.drop("_salt")
