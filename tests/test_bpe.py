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


def _reference_bpe_batched(
    texts: list[str], n_merges: int, merges_per_round: int, min_count: int = 2
):
    """Pure-Python replica of the BATCHED trainer: per round, rank pairs by
    (count DESC, left, right), accept up to M token-disjoint pairs, apply
    them in accept order."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [B.END_OF_WORD])] += 1
    merges = []
    while len(merges) < n_merges:
        pairs = Counter()
        for toks, freq in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += freq
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        accepted, used = [], set()
        for (a, b), n in ranked:
            if n < min_count:
                break
            if a in used or b in used:
                continue
            accepted.append((len(merges) + len(accepted), a, b, n))
            used.update((a, b))
            if len(accepted) >= min(merges_per_round, n_merges - len(merges)):
                break
        if not accepted:
            break
        merges.extend(accepted)
        new_vocab = Counter()
        rules = [(r, a, b, n) for r, a, b, n in accepted]
        for toks, freq in vocab.items():
            new_vocab[tuple(B.apply_merges(list(toks), rules))] += freq
        vocab = new_vocab
    return merges


def test_batched_matches_pure_python_batched_reference(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    for m in (2, 3, 5):
        got = B.train_bpe(docs, n_merges=10, merges_per_round=m)
        assert got == _reference_bpe_batched(TEXTS, 10, m), f"M={m}"


def test_batched_equals_greedy_when_picks_dont_interact(spark):
    # Each dominant pair is spread across TWO words, so every merge-created
    # pair inherits only a per-word sub-count (<= 20), strictly below the
    # next pick's total (22+). The top-4 picks are token-disjoint and no
    # created pair can overtake: batched MUST equal strictly-greedy here.
    words = (
        ["ab"] * 20 + ["abr"] * 20 + ["cd"] * 15 + ["cds"] * 15
        + ["ef"] * 13 + ["eft"] * 12 + ["gh"] * 11 + ["ghu"] * 11
    )
    texts = [" ".join(words)]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    greedy = B.train_bpe(docs, n_merges=4, merges_per_round=1)
    batched = B.train_bpe(docs, n_merges=4, merges_per_round=4)
    assert [(a, b, n) for _, a, b, n in greedy] == [
        ("a", "b", 40), ("c", "d", 30), ("e", "f", 25), ("g", "h", 22)
    ]
    assert batched == greedy


def test_merges_per_round_one_is_strictly_greedy(spark, learned):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    assert B.train_bpe(docs, n_merges=12, merges_per_round=1) == learned


def test_batched_respects_n_merges_cap_and_validates(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = B.train_bpe(docs, n_merges=5, merges_per_round=4)
    assert len(got) == 5 and [r for r, *_ in got] == [0, 1, 2, 3, 4]
    with _pytest.raises(ValueError):
        B.train_bpe(docs, merges_per_round=0)


class TestEncodeCorpus:
    def test_operator_equals_reference_encoder(self, spark, sf_dir):
        """encode_corpus must agree with the pure-Python apply_merges on
        every document — same rules, same word split, same counts."""
        import re

        from kafka_clickhouse_example_spark.operators import bpe as B
        from kafka_clickhouse_example_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(60)
        merges = B.train_bpe(docs, n_merges=6, merges_per_round=3)
        got = {r.doc_id: (r.n_words, r.n_pieces) for r in B.encode_corpus(docs, merges).collect()}
        for row in docs.select("doc_id", "text").collect():
            words = [w for w in re.split(r"\s+", row.text.strip()) if w]
            pieces = sum(
                len(B.apply_merges(list(w) + [B.END_OF_WORD], merges)) for w in words
            )
            assert got[row.doc_id] == (len(words), pieces), f"doc {row.doc_id}"

    def test_more_merges_never_increase_pieces(self, spark, sf_dir):
        from kafka_clickhouse_example_spark.operators import bpe as B
        from kafka_clickhouse_example_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(40)
        merges = B.train_bpe(docs, n_merges=6, merges_per_round=3)
        few = {r.doc_id: r.n_pieces for r in B.encode_corpus(docs, merges[:2]).collect()}
        many = {r.doc_id: r.n_pieces for r in B.encode_corpus(docs, merges).collect()}
        assert all(many[d] <= few[d] for d in few)

    def test_empty_and_whitespace_docs(self, spark):
        from kafka_clickhouse_example_spark.operators import bpe as B

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "ab ab")], "doc_id long, text string"
        )
        rules = [(0, "a", "b", 2), (1, "ab", B.END_OF_WORD, 2)]
        rows = {r.doc_id: (r.n_words, r.n_pieces) for r in B.encode_corpus(df, rules).collect()}
        assert rows[1] == (0, 0) and rows[2] == (0, 0)
        # 'ab' -> [a,b,</w>] -> [ab,</w>] -> [ab</w>]: 1 piece per word
        assert rows[3] == (2, 2)

    def test_null_text_doc(self, spark):
        """NULL text must encode as (0, 0) like empty docs, not abort the
        job (advisor finding: split(trim(NULL)) crossed Arrow as None)."""
        from kafka_clickhouse_example_spark.operators import bpe as B

        df = spark.createDataFrame(
            [(1, None), (2, "ab ab"), (3, None)], "doc_id long, text string"
        )
        rules = [(0, "a", "b", 2)]
        rows = {r.doc_id: (r.n_words, r.n_pieces) for r in B.encode_corpus(df, rules).collect()}
        assert rows[1] == (0, 0) and rows[3] == (0, 0)
        assert rows[2] == (2, 4)  # 'ab' -> [ab, </w>] twice


def test_batched_escalates_past_a_hot_token_head(spark):
    """A corpus whose top-ranked pairs all share one hot token must still
    fill the batch from disjoint pairs deeper in the ranking (the fixed
    4M+4 window would accept only 1) — batched must keep matching the
    full-ranking pure-Python reference on such corpora."""
    from kafka_clickhouse_example_spark.operators import bpe as B

    # 'e' appears in many distinct high-count pairs: eX words dominate the
    # ranking head; disjoint pairs (from the q/r/s/t words) rank below.
    rows = []
    for i, c in enumerate("abcdfghijklm"):
        rows.append((f"e{c} " * (60 - i),))           # pairs ('e', c), all share 'e'
    for j, (x, y) in enumerate([("q", "r"), ("s", "t"), ("u", "v"), ("w", "x")]):
        rows.append((f"{x}{y} " * (20 - j),))          # disjoint tail pairs
    docs = spark.createDataFrame(rows, "text string")
    merges = B.train_bpe(docs, n_merges=4, merges_per_round=4, min_count=2)
    got = {(a, b) for _, a, b, _ in merges}
    # the head window (4M+4 = 20 rows) holds only eX/X</w> pairs, which
    # collapse to 2 disjoint accepts — filling the batch of 4 REQUIRES
    # fetching past rank 20 to the q/s tail pairs
    assert len(merges) == 4
    assert ("q", "r") in got and ("s", "t") in got


def test_encode_corpus_string_ids(spark):
    from kafka_clickhouse_example_spark.operators import bpe as B

    df = spark.createDataFrame(
        [("doc-a", "ab ab"), ("doc-b", "x")], "doc_id string, text string"
    )
    rules = [(0, "a", "b", 2)]
    got = {r.doc_id: (r.n_words, r.n_pieces) for r in B.encode_corpus(df, rules).collect()}
    assert got == {"doc-a": (2, 4), "doc-b": (1, 2)}
