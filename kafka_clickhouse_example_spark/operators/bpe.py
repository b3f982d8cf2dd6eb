"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): learn merge
rules from a corpus — the missing sibling of operators/text.py's BPE-ish
tokenizer, which only APPLIES a fixed segmentation.

Spark-first shape, and why it scales: classic BPE trains on the WORD
FREQUENCY table, not the corpus — the state is (token-sequence, freq) per
distinct word, which is vocabulary-sized (millions of rows at 100 TB, not
trillions). The corpus is scanned exactly once to build that table; every
merge iteration then runs over the compact vocab relation:

    pair counts : explode adjacent token pairs weighted by word freq ->
                  one bounded groupBy (pair cardinality <= total tokens)
    argmax      : TakeOrdered(1) with a lexicographic tiebreak ->
                  deterministic on any partitioning; O(1) rows to driver
    merge step  : one Arrow pass rewriting token arrays (left-to-right,
                  non-overlapping — inherently sequential per word, so a
                  vectorized Python pass is the honest tool, same verdict
                  as the shingle kernels in operators/dedup.py)

Driver state is O(n_merges) merge rules; lineage is cut every few rounds
(the iterative-operator rule, see operators/checkpointing.py).

Upgrade path for production vocab sizes (~32k merges): strictly-greedy BPE
is one merge per round; merging the top-M NON-OVERLAPPING pairs per round
(pairs sharing no token) is semantically identical for those pairs and
cuts rounds ~10x — the standard wall-clock trade in distributed BPE
trainers. This module keeps the strictly-greedy order so the reference
equality test stays exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.checkpointing import materialize

END_OF_WORD = "</w>"
CHECKPOINT_EVERY = 4


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(tokens: array<string>, freq: long) — one row per distinct word,
    tokens initialized to characters + the end-of-word marker. The single
    corpus-sized pass of the whole training job."""
    words = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    freq = words.groupBy("w").agg(F.count("*").alias("freq"))
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))
    return freq.select(
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("tokens"), "freq"
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.expr(
        "filter(transform(tokens, (t, i) -> "
        "IF(i < size(tokens) - 1, struct(t AS a, tokens[i + 1] AS b), NULL)), "
        "p -> p IS NOT NULL)"
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def _merge_pair(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every token array, replacing left-to-right non-overlapping
    (a, b) adjacencies with the concatenated token. One Arrow pass."""

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        merged_tok = a + b
        for pdf in batches:
            out = []
            for toks in pdf["tokens"]:
                toks = list(toks)
                res = []
                i = 0
                n = len(toks)
                while i < n:
                    if i < n - 1 and toks[i] == a and toks[i + 1] == b:
                        res.append(merged_tok)
                        i += 2
                    else:
                        res.append(toks[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"tokens": out, "freq": pdf["freq"]})

    return vocab.mapInPandas(rewrite, "tokens array<string>, freq long")


def train_bpe(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns
    [(rank, left, right, count), ...] in merge order.

    Deterministic: the argmax tiebreak is (count DESC, left, right), so the
    learned rules are independent of partitioning and cluster size —
    pinned against a pure-Python reference in tests/test_bpe.py. Stops
    early when the best pair's count falls below ``min_count`` (merging
    singletons is noise).
    """
    vocab = materialize(word_freq_table(docs, text_col))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((rank, a, b, n))
        vocab = _merge_pair(vocab, a, b)
        if (rank + 1) % CHECKPOINT_EVERY == 0:
            vocab = materialize(vocab)
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def apply_merges(tokens: list[str], merges: list[tuple[int, str, str, int]]) -> list[str]:
    """Reference encoder: apply learned rules in rank order (driver-side
    helper for tests and spot checks; the corpus-scale APPLICATION path is
    the segmentation in operators/text.py)."""
    for _, a, b, _ in merges:
        res: list[str] = []
        i = 0
        while i < len(tokens):
            if i < len(tokens) - 1 and tokens[i] == a and tokens[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(tokens[i])
                i += 1
        tokens = res
    return tokens
