"""Join-planning helpers shared across operator families.

Kept dependency-free (no pandas UDFs, no family constants) so that any
operator module — dedup, graph, future families — can mark a join side
without pulling in an unrelated heavy module (round-10 ADVICE: graph.py
imported this from dedup for a one-line hint wrapper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def corpus_side(rel: DataFrame) -> DataFrame:
    """Mark a corpus-proportional relation as a sort-merge (never
    broadcast, never hash-build) join side, whatever Catalyst's size
    estimate says.

    Why an explicit hint and not trust in stats: the shingle memo is a
    ``localCheckpoint`` (LogicalRDD), and its propagated estimate sits
    below the 64 MB broadcast threshold well past the point where the
    SERIALIZED rows outgrow the driver — the round-10 sf30 probe measured
    the minhash verify join statically broadcasting BOTH O(corpus)
    shingle sides at 1.5M docs, dying at spark.driver.maxResultSize
    (26 tasks / 1028 MiB), while the identical plan at 500k docs
    collected ~350 MB per side and "worked" silently. Same failure class
    as the round-9 split-leakage broadcast cap, one stage later.

    Why SMJ and not shuffled-hash: tried; at the same 1.5M-doc corpus the
    per-task hash build of corpus/32 shingle-array rows dies with "Can't
    acquire ... bytes memory to build hash relation" — the exact failure
    signature the r9 split-leakage SHJ attempt hit. SMJ spills instead of
    holding a per-task hash relation, and the sort keys are bare doc_id
    longs (skew-free: one row per doc).
    """
    return rel.hint("merge")
