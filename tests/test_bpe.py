"""BPE training contracts: exact agreement with a pure-Python reference
implementation (same greedy objective, same tiebreak), determinism across
partitionings, and round-trip consistency of the learned rules."""

from __future__ import annotations

from collections import Counter

import pytest

from kafka_clickhouse_example_spark.operators import bpe as B


def _reference_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Straight-line reimplementation of Sennrich-style BPE used as the
    independent oracle for the distributed trainer."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [B.END_OF_WORD])] += 1
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for toks, freq in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += freq
        if not pairs:
            break
        # argmax with (count DESC, left, right) tiebreak
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        new_vocab = Counter()
        for toks, freq in vocab.items():
            new_vocab[tuple(B.apply_merges(list(toks), [(rank, a, b, n)]))] += freq
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest wide",
    "low newer low wide lowest",
]


@pytest.fixture(scope="module")
def learned(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    return B.train_bpe(docs, n_merges=12)


def test_matches_pure_python_reference(learned):
    assert learned == _reference_bpe(TEXTS, 12)


def test_deterministic_across_partitionings(spark, learned):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string").repartition(7)
    assert B.train_bpe(docs, n_merges=12) == learned


def test_merges_are_adjacent_compositions(learned):
    # every merged token after rank 0 must be buildable from earlier
    # vocabulary (chars, the end marker, or prior merges) — the defining
    # BPE invariant
    known = set()
    for rank, a, b, n in learned:
        for side in (a, b):
            assert len(side) == 1 or side == B.END_OF_WORD or side in known, (
                f"rank {rank}: {side!r} not derivable"
            )
        known.add(a + b)
        assert n >= 2


def test_learned_rules_compress_training_words(learned):
    # applying the rules to a frequent training word must shorten it
    toks = list("low") + [B.END_OF_WORD]
    out = B.apply_merges(toks, learned)
    assert len(out) < len(toks)
    assert "".join(out) == "low" + B.END_OF_WORD  # lossless segmentation


def test_min_count_stops_training(spark):
    docs = spark.createDataFrame([("a b c d",)], "text string")  # all singletons
    assert B.train_bpe(docs, n_merges=5) == []
