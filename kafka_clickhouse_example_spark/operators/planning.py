"""Join-planning helpers shared across operator families.

Kept dependency-free (no pandas UDFs, no family constants) so that any
operator module — dedup, graph, future families — can mark a join side
without pulling in an unrelated heavy module (round-10 ADVICE: graph.py
imported this from dedup for a one-line hint wrapper).
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Executable partition-sizing rule (round-11 verdict ask #5).
#
# SCALE.md documents the rule twice with measured deaths on a 16 GiB heap /
# 32 task slots:
#   - SHJ build: sf30ctl exact-jaccard, 67M postings at 32 shuffle
#     partitions -> ~2.1M x 24 B build rows/task dies ("Can't acquire
#     134217728 bytes memory to build hash relation"); stock SHJ at 128
#     partitions completes in 130.7 s.
#   - SMJ sort state: sf100ctl split-leakage audit, 5M shingle-array rows
#     (~700 B/row serialized — measured ~350 MB per 500k-doc side) at 32
#     partitions OOMs a task's sort; completes at 128 (111.7 s).
# AQE cannot rescue either: it coalesces partitions, it does not split
# non-skewed ones. On a real cluster spark.sql.shuffle.partitions scales
# with executors (tens of thousands at 100 TB); the rule below turns the
# arithmetic into a warning at plan-construction time instead of a
# mid-job death hours in.
#
# Bound: per-task RAW state (rows/partitions x serialized bytes/row) must
# stay under TASK_STATE_SHARE of the slot's execution-memory share
# (heap x spark.memory.fraction / slots). 1/8 calibrates against all four
# measured points with margin on both sides: the failing shapes sit at
# 50 MB and 109 MB per task against a 40 MB bound (warn), the passing
# 128-partition shapes at 12.6 MB and 27.3 MB (silent). The eighth
# absorbs what the raw estimate ignores — hash-relation / sort-buffer
# expansion (2-4x) and other operators sharing the task's memory.
# ---------------------------------------------------------------------------
EXECUTION_MEMORY_FRACTION = 0.6  # spark.memory.fraction default
TASK_STATE_SHARE = 0.125

# Serialized bytes/row estimates for the two state shapes this engine
# ships (documented provenance; callers may pass their own):
POSTING_ROW_BYTES = 24  # (doc_id long, n_sh int->8 B aligned, shingle-hash long)
SHINGLE_ARRAY_ROW_BYTES = 700  # measured: ~350 MB per 500k-doc side (r10 probe)

# RETIRED r11 (kept for the measurement provenance): the cap once gated an
# ARRAY-carrying verify broadcast in incremental_minhash_pairs' broadcast
# strategy (round-11 dedup-store probe: ~350 MB at 500k candidates fine,
# ~1.05 GB at 1.5M dying at spark.driver.maxResultSize; the cap sat
# between). The r11 verify-join restructure broadcasts only the ARRAY-FREE
# candidate pair list (16 B/row — the same 1.5M-candidate store broadcasts
# ~24 MB), so the hazard the cap guarded is structurally unreachable and
# the eager per-call candidate count it required is gone.
VERIFY_BROADCAST_CAP_BYTES = 512 * 2**20


def per_task_state_overflow(
    n_rows: int,
    bytes_per_row: float,
    *,
    shuffle_partitions: int,
    heap_bytes: int,
    task_slots: int,
    memory_fraction: float = EXECUTION_MEMORY_FRACTION,
    label: str = "",
) -> dict | None:
    """The partition-sizing rule as arithmetic: returns None when the
    estimated per-task build/sort state fits, else a dict carrying the
    numbers and the shuffle.partitions floor that would fit. Pure — no
    session access — so tests pin the documented failing/passing shapes
    exactly."""
    share = heap_bytes * memory_fraction / max(task_slots, 1)
    bound = share * TASK_STATE_SHARE
    per_task = n_rows * bytes_per_row / max(shuffle_partitions, 1)
    if per_task <= bound:
        return None
    return {
        "label": label,
        "per_task_state_bytes": int(per_task),
        "bound_bytes": int(bound),
        "execution_share_bytes": int(share),
        "shuffle_partitions": shuffle_partitions,
        "partitions_floor": math.ceil(n_rows * bytes_per_row / bound),
    }


def warn_if_task_state_overflows(
    spark, n_rows: int, bytes_per_row: float, label: str
) -> dict | None:
    """Session-reading wrapper: estimate per-task state for an SHJ build /
    SMJ sort over ``n_rows`` state rows under the CURRENT session sizing
    and ``warnings.warn`` with the partitions arithmetic when it overflows
    — same up-front-contract pattern as the dedup broadcast ratio guard
    (operators/dedup.py BROADCAST_NEW_RATIO_BOUND), but a warning rather
    than a raise: an overflow estimate is a forecast from a bytes/row
    constant, not a contract violation, and the conf knob may already be
    set correctly cluster-side in ways local arithmetic can't see.

    Returns the overflow dict (None when the estimate fits) so callers can
    also use the rule PRESCRIPTIVELY — e.g. the hot-shingle cut switches
    from its window form to the sort-free aggregate-join form on overflow,
    because a single hot key cannot be split by more partitions and must
    not be buffered by a sort (round-11 ADVICE)."""
    try:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        slots = spark.sparkContext.defaultParallelism
        heap = _jvm_max_heap_bytes(spark)
        frac = float(spark.conf.get("spark.memory.fraction", "0.6"))
    except Exception:
        return  # sizing introspection must never break the query
    hit = per_task_state_overflow(
        n_rows,
        bytes_per_row,
        shuffle_partitions=parts,
        heap_bytes=heap,
        task_slots=slots,
        memory_fraction=frac,
        label=label,
    )
    if hit:
        warnings.warn(
            f"{label}: estimated per-task join/sort state "
            f"{hit['per_task_state_bytes'] / 2**20:.0f} MiB "
            f"({n_rows} rows x {bytes_per_row:.0f} B / "
            f"{parts} shuffle partitions) exceeds the sizing bound "
            f"{hit['bound_bytes'] / 2**20:.0f} MiB "
            f"(heap {heap / 2**30:.1f} GiB x fraction {frac} / {slots} "
            f"slots x {TASK_STATE_SHARE}). Raise "
            f"spark.sql.shuffle.partitions to at least "
            f"{hit['partitions_floor']} (a floor — measured-good configs "
            "sat 3-4x above it; AQE cannot split non-skewed partitions). "
            "See SCALE.md 'partition-sizing rule'.",
            RuntimeWarning,  # ResourceWarning is IGNORED by default filters — a guard no one sees is no guard (round-11 probe finding)
            stacklevel=3,
        )
    return hit


# ---------------------------------------------------------------------------
# Memo-residency rule (round-11 sf300ctl finding, SCALE.md "memo
# residency"): a localCheckpoint memo's deserialized blocks live in the
# unified pool's STORAGE region, and storage at/below
# spark.memory.storageFraction cannot be evicted by execution — so a memo
# that outgrows the pool starves every concurrent shuffle writer
# ("UNABLE_TO_ACQUIRE_MEMORY ... got 0" with spill() failing), and no
# shuffle-partition count can fix it. Measured on the 16 GiB / 32-slot
# rig: the 5M-doc shingle memo (~10 GB deserialized, ~1.0x the pool) ran
# both dedup walls to completion; the 15M-doc memo (~31 GB, ~3.2x) killed
# both. The 1.5x headroom bound separates the two measured points; past
# it the answer is the parquet-backed store (operators/dedup_store.py's
# ingest shape — on a real cluster, the shared HDFS/object-store table),
# which round 11 measured completing both queries at 15M docs.
# ---------------------------------------------------------------------------
MEMO_RESIDENCY_HEADROOM = 1.5
# Deserialized bytes/row for shingle-array memo rows: ~2-3x the ~700 B
# serialized estimate (Java object headers + UTF-16 strings + array boxes)
MEMO_ARRAY_ROW_BYTES_DESER = 2048


def memo_residency_overflow(
    n_rows: int,
    bytes_per_row: float,
    *,
    heap_bytes: int,
    memory_fraction: float = EXECUTION_MEMORY_FRACTION,
) -> dict | None:
    """The memo-residency rule as arithmetic: None when the estimated
    deserialized memo footprint fits MEMO_RESIDENCY_HEADROOM x the
    unified pool, else the numbers. Pure, like per_task_state_overflow,
    so tests pin the measured shapes exactly."""
    pool = heap_bytes * memory_fraction
    est = n_rows * bytes_per_row
    if est <= MEMO_RESIDENCY_HEADROOM * pool:
        return None
    return {
        "memo_est_bytes": int(est),
        "pool_bytes": int(pool),
        "ratio": round(est / pool, 2),
    }


def warn_if_memo_overflows(
    spark, n_rows: int, bytes_per_row: float, label: str
) -> None:
    """Session-reading wrapper for the memo-residency rule: warn when a
    localCheckpoint memo of ``n_rows`` would pin more storage than the
    unified pool can give back, pointing at the parquet-backed store."""
    try:
        heap = _jvm_max_heap_bytes(spark)
        frac = float(spark.conf.get("spark.memory.fraction", "0.6"))
    except Exception:
        return  # sizing introspection must never break the query
    hit = memo_residency_overflow(
        n_rows, bytes_per_row, heap_bytes=heap, memory_fraction=frac
    )
    if hit:
        warnings.warn(
            f"{label}: estimated deserialized memo footprint "
            f"{hit['memo_est_bytes'] / 2**30:.1f} GiB is "
            f"{hit['ratio']}x the unified memory pool "
            f"({hit['pool_bytes'] / 2**30:.1f} GiB = heap x fraction "
            f"{frac}). localCheckpoint blocks pin the storage region and "
            "starve shuffle writers past this point (measured at 15M "
            "docs — SCALE.md 'memo residency'); materialize the memo to "
            "a parquet-backed store instead "
            "(operators/dedup_store.py ingest shape).",
            RuntimeWarning,  # ResourceWarning is IGNORED by default filters — a guard no one sees is no guard (round-11 probe finding)
            stacklevel=3,
        )


def _jvm_max_heap_bytes(spark) -> int:
    """The JVM's actual -Xmx — authoritative over parsing
    spark.driver.memory (which may be unset when the JVM was launched
    with a default)."""
    return spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()

# Expansion markers for the broadcast-valley criterion (SCALE.md, round
# 10): a BroadcastExchange whose subtree carries one of these widens rows
# invisibly to Catalyst's size estimate (Python UDF output, explode
# fan-out, or a localCheckpoint memo whose estimate is inherited), i.e.
# the real materialized side can outgrow the driver/broadcast caps while
# the estimate stays under autoBroadcastJoinThreshold.
VALLEY_MARKERS = ("ArrowEvalPython", "BatchEvalPython", "Generate ", "Scan ExistingRDD")


def plan_indent(line: str) -> int:
    """Tree-string indentation depth: count chars before the node name
    (toString uses ':'/'+- '/'   ' prefixes; the first alpha char of the
    operator name marks the depth)."""
    for i, ch in enumerate(line):
        if ch.isalpha() and line[i : i + 2] != "- ":
            return i
    return len(line)


def broadcast_subtrees(plan: str) -> list[str]:
    """Return the subtree text of every BroadcastExchange node in a
    physical-plan tree string (lines deeper-indented than the node)."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = plan_indent(line)
        sub = [line]
        for nxt in lines[i + 1 :]:
            if not nxt.strip():
                break
            if plan_indent(nxt) <= depth:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def broadcast_parent_joins(plan: str) -> list[str]:
    """For every BroadcastExchange node, the nearest shallower-indented
    ancestor line naming a Join — the join that consumes the broadcast.
    Lets tests assert structure ("every broadcast feeds a LeftAnti probe")
    instead of counting substrings, which exchange reuse or plan-printing
    changes across Spark versions would silently flip (round-10 ADVICE)."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = plan_indent(line)
        parent = ""
        for prev in reversed(lines[:i]):
            d = plan_indent(prev)
            if d < depth:
                depth = d
                if "Join" in prev:
                    parent = prev[plan_indent(prev):]  # drop the ':  +- ' tree prefix
                    break
        out.append(parent)
    return out


def valley_flags(plan: str) -> list[dict]:
    """Broadcast-valley flags in one physical-plan string: every
    BroadcastExchange subtree carrying an expansion marker. Used by
    contrib/broadcast_valley_audit.py (registry-wide sweep artifact) and
    the regression pytest that keeps NEW queries out of the valley."""
    found = []
    for sub in broadcast_subtrees(plan):
        hit = [m.strip() for m in VALLEY_MARKERS if m in sub]
        if hit:
            head = sub.splitlines()
            found.append({"markers": hit, "subtree_head": head[: min(4, len(head))]})
    return found


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
