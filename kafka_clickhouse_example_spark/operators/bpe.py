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

Production vocab sizes (~32k merges): strictly-greedy BPE is one merge per
round; ``merges_per_round=M`` accepts the top-M TOKEN-DISJOINT pairs from
one pair-count pass and applies them in a single Arrow rewrite — cutting
rounds (and pair-count shuffles) ~M× , the standard wall-clock trade in
distributed BPE trainers. Because accepted pairs share no token, applying
them together equals applying them sequentially; the batch matches
strictly-greedy EXACTLY unless a merge-created pair (x, ab) would have
out-counted a later accepted candidate — rare in natural corpora and
bounded by the batch (never compounds across rounds, since counts are
recomputed each round). tests/test_bpe.py pins batched == greedy on a
non-interacting corpus and batched == a pure-Python batched reference in
general.
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


def _apply_rules(vocab: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Rewrite every token array, replacing left-to-right non-overlapping
    (a, b) adjacencies with the concatenated token, one rule after another
    in accept order — ONE Arrow pass for the whole batch of rules (the
    per-word loop is inherently sequential, so a vectorized Python pass is
    the honest tool; batching rules amortizes the Arrow round-trip)."""

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for toks in pdf["tokens"]:
                toks = list(toks)
                for a, b in rules:
                    merged_tok = a + b
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
                    toks = res
                out.append(toks)
            yield pd.DataFrame({"tokens": out, "freq": pdf["freq"]})

    return vocab.mapInPandas(rewrite, "tokens array<string>, freq long")


def train_bpe(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_count: int = 2,
    merges_per_round: int = 1,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns
    [(rank, left, right, count), ...] in merge order.

    Deterministic: the argmax tiebreak is (count DESC, left, right), so the
    learned rules are independent of partitioning and cluster size —
    pinned against a pure-Python reference in tests/test_bpe.py. Stops
    early when the best pair's count falls below ``min_count`` (merging
    singletons is noise).

    ``merges_per_round=M`` accepts up to M TOKEN-DISJOINT pairs per
    pair-count pass (skipping candidates that share a token with an
    earlier accept in the same batch) and applies them in one Arrow
    rewrite — ~M× fewer shuffles. M=1 IS strictly-greedy; see the module
    header for the exactness contract of M>1.
    """
    if merges_per_round < 1:
        raise ValueError(f"merges_per_round must be >= 1: {merges_per_round}")
    vocab = materialize(word_freq_table(docs, text_col))
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        batch_cap = min(merges_per_round, n_merges - len(merges))
        # over-fetch so the disjointness filter still fills the batch, and
        # ESCALATE (k x4) when a hot token dominates the head of the ranked
        # list — the contract is "top-M token-disjoint pairs of the FULL
        # ranking", so a fixed window may not see enough disjoint
        # candidates (review finding: 20 'e'-pairs up front would
        # otherwise shrink the batch to 1). Escalation stops when the
        # fetch came back short (ranking exhausted) or dipped below
        # min_count; each retry is one more TakeOrdered, rare in practice.
        counts = _pair_counts(vocab)
        k = batch_cap if batch_cap == 1 else 4 * batch_cap + 4
        while True:
            top = counts.orderBy(F.col("n").desc(), "a", "b").limit(k).collect()
            accepted: list[tuple[int, str, str, int]] = []
            used: set[str] = set()
            exhausted = len(top) < k or (top and top[-1]["n"] < min_count)
            for row in top:
                if row["n"] < min_count:
                    break
                a, b = row["a"], row["b"]
                if a in used or b in used:
                    continue
                accepted.append((len(merges) + len(accepted), a, b, int(row["n"])))
                used.update((a, b))
                if len(accepted) >= batch_cap:
                    break
            if len(accepted) >= batch_cap or exhausted:
                break
            k *= 4
        if not accepted:
            break
        merges.extend(accepted)
        vocab = _apply_rules(vocab, [(a, b) for _, a, b, _ in accepted])
        rounds += 1
        if rounds % CHECKPOINT_EVERY == 0:
            vocab = materialize(vocab)
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE ENCODE: tokenize every document with the trained
    merge rules, returning (id, n_words, n_pieces) — the corpus-scale
    application step that turns a learned vocabulary into token counts
    (shard sizing, packing budgets, per-doc fertility).

    Map-only: rules broadcast inside the closure (O(n_merges) driver
    state), ONE Arrow pass over the corpus, no shuffle at all. Words are
    split JVM-side with the exact expression training's word_freq_table
    uses, so train/encode tokenization can never diverge; per-word
    segmentations memoize within a task (Zipf: the hot words dominate, so
    the merge loop runs once per distinct word per task, not per
    occurrence). Semantics: identical to :func:`apply_merges` per word —
    pinned exactly in tests/test_bpe.py.
    """
    rules = [(a, b) for _, a, b, _ in merges]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_pieces(word: str) -> int:
            n = memo.get(word)
            if n is None:
                toks = list(word) + [END_OF_WORD]
                for a, b in rules:
                    res: list[str] = []
                    i = 0
                    ln = len(toks)
                    while i < ln:
                        if i < ln - 1 and toks[i] == a and toks[i + 1] == b:
                            res.append(a + b)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    toks = res
                n = len(toks)
                memo[word] = n
            return n

        for pdf in batches:
            counts = [sum(map(n_pieces, ws)) for ws in pdf["words"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": [len(ws) for ws in pdf["words"]],
                    "n_pieces": counts,
                }
            )

    # NULL text must encode as (0, 0) like empty/whitespace docs, not kill
    # the job: split(trim(NULL)) is NULL, which crosses Arrow as None and
    # blew up len()/sum() in the closure (advisor finding). coalesce to an
    # empty array BEFORE the boundary so the closure only ever sees lists.
    words = F.coalesce(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
        ),
        F.array().cast("array<string>"),
    )
    # carry the id column's ACTUAL type through the Arrow boundary — a
    # hardcoded `long` broke string-keyed corpora (review finding)
    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, words.alias("words")).mapInPandas(
        encode, f"{id_col} {id_type}, n_words long, n_pieces long"
    )


def apply_merges(tokens: list[str], merges: list[tuple[int, str, str, int]]) -> list[str]:
    """Reference encoder: apply learned rules in rank order (driver-side
    helper for tests and spot checks; the corpus-scale APPLICATION path is
    :func:`encode_corpus`)."""
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
