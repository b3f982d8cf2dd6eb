"""Property-based parity for the two kernels every oracle depends on:
md5 hash bucketing (sampling/splits) and tokenization (dedup/text).

Each example ships a BATCH of generated values through one Spark job and
compares against independent pure-Python references — the cross-engine
contract is exercised on arbitrary inputs, not just the checked fixtures.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators.sampling import SPLIT_BUCKETS, hash_bucket
from kafka_clickhouse_example_spark.operators.text import tokens

# Java/RE2 \s — ASCII whitespace only (the round-2 parity rule).
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _ref_bucket(key: str) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:14], 16) % SPLIT_BUCKETS


def _ref_tokens(text: str) -> list[str]:
    return _WS.split(text.strip(" "))


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=40, unique=True))
def test_hash_bucket_matches_python_md5(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", hash_bucket(F.col("k")).alias("b")).collect()
    }
    assert got == {k: _ref_bucket(str(k)) for k in keys}


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"  # Spark strings are NUL-hostile
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_tokenizer_matches_ascii_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens(F.col("t")).alias("toks")).collect()
    }
    assert got == {i: _ref_tokens(t) for i, t in rows}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=350,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_chunking_covers_and_slices_exactly(spark, texts):
    """text_chunk_overlap invariants on arbitrary text: every chunk is the
    exact [start, start+CHUNK) slice, starts advance by STRIDE from 0, and
    chunk coverage tiles the whole document (no gap, no truncation)."""
    from kafka_clickhouse_example_spark.plans.queries_corpus import CHUNK, STRIDE

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bound = F.greatest(F.length("text") - F.lit(1), F.lit(0))
    out = (
        df.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), bound, F.lit(STRIDE))).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.substring(F.col("text"), F.col("pos") + 1, CHUNK).alias("chunk"),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["chunk"]))
    for i, t in enumerate(texts):
        chunks = sorted(by_doc[i])
        # Python slicing over code points == Spark substring on its string
        want_starts = list(range(0, max(len(t) - 1, 0) + 1, STRIDE))
        assert [p for p, _ in chunks] == want_starts
        for p, c in chunks:
            assert c == t[p : p + CHUNK]
        # Overlap is exactly CHUNK-STRIDE, so dropping it from every
        # non-first chunk reconstructs the document (a trailing chunk
        # shorter than the overlap contributes nothing — its content is
        # already covered by its predecessor).
        reconstructed = chunks[0][1] + "".join(
            c[CHUNK - STRIDE :] for _, c in chunks[1:]
        )
        assert reconstructed == t


@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.lists(st.integers(min_value=0, max_value=31), min_size=0, max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_simhash_block_scheme_is_pigeonhole_complete(fp, flip_bits):
    """Manku block candidacy is LOSSLESS inside the radius: flip <= k bits
    of any 32-bit fingerprint and at least one of the k+1 8-bit blocks is
    untouched (the equi-join therefore finds every in-radius pair). Pure
    arithmetic mirror of operators/dedup.simhash_hamming_pairs."""
    from kafka_clickhouse_example_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        SIMHASH_PAIR_BITS,
    )

    other = fp
    for b in set(flip_bits):  # distinct positions => hamming = len(set)
        other ^= 1 << b
    n_blocks = SIMHASH_MAX_HAMMING + 1
    width = SIMHASH_PAIR_BITS // n_blocks
    mask = (1 << width) - 1
    shared = any(
        (fp >> (i * width)) & mask == (other >> (i * width)) & mask
        for i in range(n_blocks)
    )
    assert shared, (fp, other)


@given(st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_temperature_rates_monotone_and_bounded(counts):
    """The tau=2 keep-rate rule: the smallest stratum keeps everything
    (rate == buckets), larger strata get smaller rates, and expected kept
    mass n*rate/buckets is non-decreasing in n (bigger strata never end up
    smaller than smaller strata after sampling). Pure mirror of
    operators/sampling.temperature_sample's integer arithmetic."""
    import math

    from kafka_clickhouse_example_spark.operators.sampling import TEMPERATURE_BUCKETS

    mn = min(counts)
    rates = {
        n: (TEMPERATURE_BUCKETS * math.isqrt(mn)) // math.isqrt(n) for n in counts
    }
    assert rates[mn] == TEMPERATURE_BUCKETS
    ordered = sorted(rates)
    for a, b in zip(ordered, ordered[1:]):
        assert rates[a] >= rates[b]           # bigger stratum, smaller rate
        assert a * rates[a] <= b * rates[b] * 1.0 + b  # kept mass non-decreasing (+1 doc slack for floor)


# --- PII scrubber properties ----------------------------------------------


def _ref_luhn(digits: str) -> bool:
    ds = [int(c) for c in digits if c.isdigit()]
    if len(ds) < 12:
        return False
    total = 0
    for i, d in enumerate(reversed(ds)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(alphabet="0123456789", min_size=16, max_size=16),
        min_size=1,
        max_size=20,
    )
)
def test_luhn_matches_python_reference(spark, numbers):
    from kafka_clickhouse_example_spark.operators.pii import luhn_valid

    df = spark.createDataFrame([(n,) for n in numbers], "cc string")
    got = {r.cc: r.ok for r in df.select("cc", luhn_valid(F.col("cc")).alias("ok")).collect()}
    assert got == {n: _ref_luhn(n) for n in numbers}


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.sampled_from("word data spark value row table".split()), min_size=1, max_size=12),
    st.integers(min_value=0, max_value=10**9),
)
def test_planted_email_always_found_and_scrubbed(spark, words, uid):
    """Whatever benign text surrounds it, a planted email is detected and
    the redacted output carries no '@' and no residual pattern match."""
    from kafka_clickhouse_example_spark.operators import pii as P

    text = " ".join(words[: len(words) // 2]) + f" u{uid}@example.org " + " ".join(words[len(words) // 2 :])
    df = spark.createDataFrame([(text,)], "text string")
    row = P.pii_scan(P.pii_redact(df)).collect()[0]
    assert row.n_email >= 1
    assert "@" not in row.redacted
    rescan = P.pii_scan(
        spark.createDataFrame([(row.redacted,)], "text string")
    ).collect()[0]
    assert rescan.n_pii == 0


def _ref_shingles(text: str, n: int = 3) -> set[str]:
    toks = _ref_tokens(text.strip())
    if text.strip() == "":
        return set()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=3,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
def test_containment_pairs_match_bruteforce(spark, texts):
    """containment_pairs on arbitrary small corpora == the O(n^2) set-math
    definition C = |Sa∩Sb| / min(|Sa|,|Sb|) at threshold 0.5, including
    the directional smaller-contained / doc_id-tiebreak rule. A tiny
    shared vocabulary forces dense overlap, so both the detected and the
    rejected regimes are exercised."""
    from kafka_clickhouse_example_spark.operators.dedup import containment_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.contained_id, r.container_id): (r.n_common, r.containment)
        for r in containment_pairs(df, 0.5).collect()
    }
    want = {}
    sh = {i: _ref_shingles(t) for i, t in rows}
    for i, _ in rows:
        for j, _ in rows:
            if i >= j or not sh[i] or not sh[j]:
                continue
            inter = len(sh[i] & sh[j])
            if inter == 0:
                continue
            c = inter / min(len(sh[i]), len(sh[j]))
            if c >= 0.5:
                small, big = (i, j) if len(sh[i]) <= len(sh[j]) else (j, i)
                want[(small, big)] = (inter, c)
    assert set(got) == set(want)
    for k, (n_common, c) in want.items():
        assert got[k][0] == n_common
        assert abs(got[k][1] - c) < 1e-12


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=60),
)
def test_kmv_merge_and_exact_mode_on_arbitrary_keys(spark, keys, cut):
    """KMV (bottom-k) mergeability on ARBITRARY key multisets and split
    points: the sketch of a union must equal the merge of the per-part
    sketches row for row (min-wise property — including empty parts and
    duplicate keys), and below k distinct keys the estimator must be the
    exact distinct count."""
    from kafka_clickhouse_example_spark.operators import sketches as SK

    k = 8
    cut = min(cut, len(keys))

    def mk(vals):
        return spark.createDataFrame([(v,) for v in vals], "k long")

    direct = SK.kmv_build(mk(keys), "k", k=k)
    merged = SK.kmv_merge(
        [SK.kmv_build(mk(keys[:cut]), "k", k=k), SK.kmv_build(mk(keys[cut:]), "k", k=k)],
        k=k,
    )
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )
    n_distinct = len(set(keys))
    if n_distinct < k:
        est = direct.agg(
            SK.kmv_estimate_col(F.count("*"), F.max("h"), k=k).alias("e")
        ).first()
        assert est.e == float(n_distinct)
