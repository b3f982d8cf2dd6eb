"""Graph algorithms over edge lists (the near-dup pair graph being the
resident producer) — iterative, driver-loop-over-rounds-only, exact
integer arithmetic so results are engine- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.checkpointing import materialize
from kafka_clickhouse_example_spark.operators.planning import corpus_side

Q30 = 1 << 30
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank_q30(
    edges: DataFrame, iters: int = 3, reliable_dir: str | None = None
) -> DataFrame:
    """PageRank over a symmetric edge list in Q30 FIXED POINT.

    Semantics (identical in any engine — every op is integer):
      deg(v)   = out-degree
      r0(v)    = Q30 // N
      r_{t+1}(v) = (15·Q30) // (100·N)
                   + (85 · Σ_{u→v} (r_t(u) // deg(u))) // 100

    Floor division leaks a little mass per round — that's the DEFINED
    semantics, traded for bit-exact reproducibility: BIGINT sums can't be
    perturbed by partial-aggregation order, unlike double PageRank whose
    low bits differ run to run.

    ``edges`` must contain both directions of each undirected pair, so
    every node has in- and out-degree ≥ 1 (no dangling handling needed).

    Scale: each round is one join of the rank relation (|nodes| rows) to
    the static edge list plus a grouped BIGINT sum — the standard
    distributed PageRank shape. The driver loop is over ROUNDS (a fixed
    constant), never data; ``n`` is the only scalar collected.
    Lineage is truncated per round exactly like duplicate_clusters' label
    propagation — executor-local by default, reliable ``checkpoint()`` when
    ``reliable_dir`` (HDFS/S3) is given so executor loss mid-iteration
    isn't fatal on a real cluster (see operators/checkpointing.py).

    An empty edge list yields an empty (node, rank) result — the near-dup
    graph of a clean corpus slice has no pairs at all.
    """
    deg = materialize(
        edges.groupBy("src").agg(F.count("*").alias("deg")), reliable_dir
    )
    n = deg.count()
    if n == 0:
        return deg.select(
            F.col("src").alias("node"), F.lit(0).cast("long").alias("rank")
        )
    base = (15 * Q30) // (100 * n)
    # deg/ranks are O(nodes) and ed is O(edges) — corpus-proportional by
    # contract, and the materialized (LogicalRDD) inputs carry the size
    # under-estimate that round 10 measured static-broadcasting O(corpus)
    # join sides: pin every round join to SMJ (see planning.corpus_side).
    ed = edges.join(corpus_side(deg), "src")
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(Q30 // n).cast("long").alias("rank")
    )
    for _ in range(iters):
        ranks = (
            ed.join(corpus_side(ranks), ed["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.expr(f"({DAMP_NUM} * s) div {DAMP_DEN}"))
                .cast("long")
                .alias("rank"),
            )
        )
        ranks = materialize(ranks, reliable_dir, eager=False)
    return ranks
