"""Similarity search over embedding columns (array<float>): brute-force
cosine top-k as the exact baseline, sign-bit LSH bucketing as the scale path,
and an Arrow/Pandas fast kernel for throughput.

Scale design (100 TB / billions of vectors):

- Brute force is O(|queries| x |corpus|). It is the right answer when the
  query set is small: broadcast the queries, stream the corpus once, no
  shuffle of the corpus at all. This plan survives any corpus size — it is
  compute-bound, embarrassingly parallel, and the top-k per query is a
  partial aggregation (TakeOrderedAndProject), not a global sort.
- Sign-bit LSH (random-hyperplane simplified to axis-aligned signs, which
  keeps it oracle-reproducible) prunes candidates to one bucket: a
  corpus-side groupBy on a small int key. Real deployments widen this to IVF
  (k-means cells) — same plan shape: bucket key join + within-bucket scan.
- The exact column-expression kernel (zip_with + left-fold aggregate) is
  bit-reproducible everywhere, hence oracle-checkable. The Pandas-UDF kernel
  (numpy/BLAS) is 10-100x faster but sums in a different order — use it for
  throughput, validate it against the exact kernel to ~1e-9 (see
  tests/test_similarity.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_BITS = 4  # 16 buckets; widen per corpus size (bits ~ log2(n / target_bucket))


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product: deterministic summation order (element order),
    identical to the DuckDB oracle's list_reduce. Not BLAS — see module doc."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(vec: Column, bits: int = LSH_BITS) -> Column:
    """LSH bucket id from the signs of the first ``bits`` dimensions."""
    acc = F.lit(0)
    for d in range(bits):
        acc = acc + F.when(F.element_at(vec, d + 1) >= 0, F.lit(2**d)).otherwise(F.lit(0))
    return acc.cast("int")


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x streamed corpus.

    Returns (qid, vec_id, cosine_sim) with rank <= k per qid, cosine desc,
    vec_id tiebreak.
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col),
        cosine(as_double(F.col(vec_col)), as_double(F.col(qvec_col))).alias("cosine_sim"),
    ).filter(F.col(qid_col) != F.col(id_col))
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine_sim", "rank")
    )


def lsh_bucket_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
) -> DataFrame:
    """Near-dup vector pairs within LSH sign buckets: candidates share a
    bucket (2^bits-way partition of the corpus), then exact cosine >= tau.

    Approximate by construction: cross-bucket pairs are unseen (recall loss
    traded for the quadratic cut). The exact variant is the brute-force scan.
    """
    b = corpus.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("v"),
        sign_bucket(as_double(F.col(vec_col)), bits).alias("bucket"),
    )
    # No join hint: the scan's size stats are accurate here (no explode
    # upstream, unlike dedup's inverted index), so Spark broadcasts while the
    # corpus fits the threshold and switches to sort-merge beyond it — the
    # right call at both test and 100 TB scale. Widen `bits` with corpus
    # size so buckets stay balanced for the shuffled case.
    a1, a2 = b.alias("a1"), b.alias("a2")
    return (
        a1.join(
            a2,
            (F.col("a1.bucket") == F.col("a2.bucket")) & (F.col("a1.vid") < F.col("a2.vid")),
        )
        .select(
            F.col("a1.vid").alias("id1"),
            F.col("a2.vid").alias("id2"),
            cosine(F.col("a1.v"), F.col("a2.v")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def topk_lsh_probe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    bits: int = LSH_BITS,
) -> DataFrame:
    """IVF-style ANN top-k: probe only the query's bucket.

    The corpus is coarsely quantized into 2^bits cells (sign-bit LSH here;
    a k-means IVF has the identical plan shape — swap ``sign_bucket`` for a
    nearest-centroid assignment). A query scores only its own cell:
    candidate volume drops ~2^bits-fold vs brute force, trading recall for
    a bucket-key equi-join that shuffles just the small query side.
    Approximate by construction; `topk_bruteforce` is its exact baseline.
    """
    c = corpus.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("_cv"),
        sign_bucket(as_double(F.col(vec_col)), bits).alias("_cb"),
    )
    q = queries.select(
        F.col(qid_col),
        as_double(F.col(qvec_col)).alias("_qv"),
        sign_bucket(as_double(F.col(qvec_col)), bits).alias("_qb"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("_cb") == F.col("_qb"))
        .filter(F.col(qid_col) != F.col(id_col))
        .select(
            F.col(qid_col),
            F.col(id_col),
            cosine(F.col("_cv"), F.col("_qv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cosine_sim", "rank")
    )


def topk_bruteforce_pandas(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput kernel: mapInPandas + numpy matmul against a broadcast
    query matrix. Arrow-batched, BLAS-backed — the 100 TB hot path.

    Summation order differs from the fold kernel (~1e-12 relative), so this
    is validated against `topk_bruteforce`, not the SQL oracle.
    """
    import numpy as np

    qids = queries_pdf["qid"].to_numpy()
    qmat = np.stack(queries_pdf["qvec"].to_numpy()).astype("float64")  # (Q, D)
    qnorm = np.linalg.norm(qmat, axis=1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")  # (N, D)
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ qmat.T) / np.outer(norms, qnorm)  # (N, Q)
            n, q = sims.shape
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, n),
                    id_col: np.tile(vids, q),
                    "cosine_sim": sims.T.ravel(),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"qid long, {id_col} long, cosine_sim double"
    ).filter(F.col("qid") != F.col(id_col))
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "cosine_sim", "rank")
    )
