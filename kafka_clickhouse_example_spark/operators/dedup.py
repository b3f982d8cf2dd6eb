"""Deduplication operators for training-data pipelines: exact (hash-groupBy),
n-gram Jaccard (inverted-index join), MinHash+LSH (signature banding), and
SimHash fingerprints.

Scale design (100 TB corpus):

- Exact dedup is a single shuffle on a 16-byte hash — the groupBy key is
  md5(text), never the text itself, so shuffle volume is O(rows), not O(bytes).
- The exact-Jaccard inverted-index join explodes (doc, shingle) pairs and
  self-joins on shingle. Fine at moderate scale; its failure mode is hot
  shingles (stop-phrases) blowing up the join. ``max_shingle_freq`` drops
  shingles appearing in more than N docs — the standard "stop-shingle" cut
  that bounds the join's output quadratically.
- MinHash+LSH is the scale path: signatures are fixed-size (K longs per doc
  regardless of doc length), candidate generation shuffles on band keys
  (bounded fan-out), and only candidates pay the exact-verify cost. This is
  the shape that survives 100 TB; the exact join is the oracle for it.
- Everything is column expressions (codegen'd); no Python in any hot path.

Determinism: all hashes derive from md5 (stable across engines/versions);
permutations are md5("<perm>:"+shingle) rather than seeded RNG, so the DuckDB
oracle can reproduce signatures exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NGRAM_DEFAULT = 3
MINHASH_PERMS = 8
LSH_BAND_ROWS = 2  # 8 perms / 2 rows => 4 bands


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles(text: Column, n: int = NGRAM_DEFAULT) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Guarded so docs with < n tokens yield an empty array (Spark's
    ``sequence(1, 0)`` would otherwise produce a *descending* sequence).
    """
    toks = _tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array()))


def perm_hash(shingle: Column, perm: int) -> Column:
    """Deterministic per-permutation shingle hash: 60 bits of
    md5('<perm>:' + shingle). Mirrors DuckDB
    ('0x' || substr(md5(perm || ':' || s), 1, 15))::BIGINT."""
    payload = F.concat(F.lit(f"{perm}:"), shingle)
    return F.conv(F.substring(F.md5(payload.cast("binary")), 1, 15), 16, 10).cast("long")


def _perm_hasher(perm: int):
    # A real closure, NOT `lambda s, p=p:` — PySpark counts default params
    # when inferring lambda arity, so a defaulted second param silently turns
    # the lambda into transform's (element, index) form.
    def f(s: Column) -> Column:
        return perm_hash(s, perm)

    return f


def minhash_signature(text: Column, num_perms: int = MINHASH_PERMS) -> Column:
    """array<long> of length ``num_perms``: min over shingles of each
    permuted hash. Empty shingle set -> NULL entries (filtered by callers)."""
    sh = shingles(text)
    return F.array(
        *[F.array_min(F.transform(sh, _perm_hasher(p))) for p in range(num_perms)]
    )


def band_keys(signature: Column, band_rows: int = LSH_BAND_ROWS) -> Column:
    """array<string> of LSH band keys: '<band>|mh_i|mh_i+1|...'.

    Two docs collide on a band iff that band's rows agree exactly — the
    classic banding construction (prob of candidacy 1-(1-j^r)^b).
    """
    num_bands = MINHASH_PERMS // band_rows
    keys = []
    for b in range(num_bands):
        parts: list[Column] = [F.lit(f"{b}")]
        for r in range(band_rows):
            parts.append(F.element_at(signature, b * band_rows + r + 1).cast("string"))
        keys.append(F.concat_ws("|", *parts))
    return F.array(*keys)


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash, keep canonical (min id) + count."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("content_md5"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs via inverted-index self-join.

    j(a,b) = |Sa ∩ Sb| / (|Sa| + |Sb| - |Sa ∩ Sb|), computed from integer
    counts (the division is a single double op — deterministic).
    """
    with_sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = with_sh.select("doc_id", F.size("sh").alias("n_sh"))
    inverted = with_sh.select("doc_id", F.explode("sh").alias("shingle"))
    if max_shingle_freq is not None:
        hot = (
            inverted.groupBy("shingle")
            .agg(F.count("*").alias("freq"))
            .filter(F.col("freq") > max_shingle_freq)
            .select("shingle")
        )
        inverted = inverted.join(F.broadcast(hot), "shingle", "left_anti")
    a = inverted.alias("a")
    b = inverted.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count("*").alias("n_common"))
    )
    sz1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n_sh1"))
    sz2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n_sh2"))
    return (
        common.join(sz1, "id1")
        .join(sz2, "id2")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_sh1") + F.col("n_sh2") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_common", "n_sh1", "n_sh2", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup pairs: signature -> band bucketing -> candidate
    pairs -> exact Jaccard verify on the candidates only.

    The verify joins candidates back to the per-doc shingle arrays and
    intersects them — O(candidates), never O(n^2). This is the 100 TB path:
    signatures and band keys are fixed-size per doc, and the band join's
    fan-out is bounded by bucket sizes, not corpus size.
    """
    with_sh = df.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col)).alias("sh"),
    ).filter(F.size("sh") > 0)
    banded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(band_keys(minhash_signature(F.col(text_col)))).alias("bk"),
    ).filter(F.col("bk").isNotNull())
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    sh1 = with_sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"))
    sh2 = with_sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2"))
    return (
        candidates.join(sh1, "id1")
        .join(sh2, "id2")
        .withColumn("n_common", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("sh1") + F.size("sh2") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_common", "jaccard")
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over (duplicated) tokens: bit i is the sign of the sum
    of +-1 contributions from each token's hash bit i. Frequency-weighted by
    construction (duplicate tokens contribute multiply)."""
    toks = _tokens(text)
    hashes = F.transform(toks, _perm_hasher(0))

    def bit_merger(i: int):
        def f(s: Column, h: Column) -> Column:
            return s + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

        return f

    acc = None
    for i in range(16):
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), bit_merger(i))
        bit = F.when(contrib >= 0, F.lit(2**i)).otherwise(F.lit(0))
        acc = bit if acc is None else acc + bit
    return acc.cast("long")
