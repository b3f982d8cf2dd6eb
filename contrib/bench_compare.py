"""Canary-normalized round-over-round bench comparison.

Usage: python contrib/bench_compare.py OLD.json NEW.json [--top N]
       python contrib/bench_compare.py r9 r10 [--top N]

A bare round ref (`r9`, `r10`, ...) resolves through git to that round's
close commit ("round N: verdict/advice/correctness/bench") and compares
the BENCH_LOCAL.json committed there — which IS the driver's run for
round N (round-11 finding: the wrapper BENCH_r{N}.json tails recover
only ~12 per-query values, while the round-close BENCH_LOCAL carries the
full 190-query map with segment factors; r10's tail values match its
BENCH_LOCAL exactly). Prefer round refs for round-over-round work.

When both artifacts carry a data_fingerprints block (bench.py stamps one
from round 11 on), the comparison checks the DATA axis first and lists
any table whose md5 changed — per-query deltas for queries reading a
changed table are not code-attributable (round-11 ask #3, made
automatic).

The round-5 verdict established that raw bench totals on this virtualized
host drift up to ~1.2x with zero code change, so raw per-query deltas are
not evidence of regression. The canonical cross-round headline (round-7
verdict ask #3) is `segment_normalized_value`: bench.py interleaves a
canary mark between every SEGMENT_SIZE queries and corrects each segment's
wall by its LOCAL host factor against the frozen SEGMENT_REF_SEC
reference. This tool divides every per-query timing by its segment's
factor before comparing, so the printed ratios are the code-attributable
ones. Two runs frozen against DIFFERENT references are put on one scale
by an exact linear rescale (normalized totals are proportional to the
frozen ref, so old x new_ref/old_ref re-expresses the old run against
the new anchor); only a differing timed_action — count-era vs noop-era
runs measuring different computations — is refused outright.

Older artifact shapes degrade gracefully: files with only the retired
pre/post bracket canary (rounds 5-7) fall back to its global host_factor;
files with neither normalize by 1.0 and the output says so — deltas
against those rounds carry the full host-noise caveat.
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

# Per-query ratios at or above this are above the host-noise attribution
# floor (contrib/canary_idle_probe.py: segment-normalized same-code
# spread bottoms out around ~1.3x for sub-3s queries) and trigger the
# round-8 cross-check protocol — the comparison itself prints the
# ready-to-run delta_crosscheck command so the follow-up step cannot be
# skipped (round-9 verdict ask #7: the driver-artifact tail deltas went
# uncross-checked precisely because the invocation was a separate manual
# step).
ATTRIBUTION_FLOOR = 1.3


def _unwrap(data: dict) -> dict:
    """Accept either bench.py's own JSON (BENCH_LOCAL.json) or the driver's
    wrapper ({"n","rc","tail","parsed",...}, BENCH_r*.json). The wrapper's
    "parsed" block carries totals + host_factor + the 12 slowest; the
    truncated "tail" still holds a visible chunk of the full first-line
    per-query map, which regex recovers best-effort (partial coverage is
    reported, never silently treated as complete)."""
    if "queries" in data or "tail" not in data:
        return data
    parsed = data.get("parsed") or {}
    not_queries = {
        "value", "normalized_value", "segment_normalized_value",
        "segment_spread", "segment_ref_sec", "ref_sec", "host_factor",
        "rows_per_sec", "normalized_rows_per_sec", "streaming_rows_per_sec",
        "wall_sec", "rows", "sf", "p50", "p95", "max", "queries_run",
        "queries_failed",
        # streaming stage-profile fields (a left-truncated tail may lack
        # both the canary and segments markers, exposing these to the
        # per-query regex)
        "scan_sec", "scan_plus_decode_sec", "full_spine_sec",
        "decode_delta_sec", "normalize_delta_sec", "wall_p50", "wall_p95",
        "wall_max", "post_drift", "pre_post_spread",
    }
    queries: dict[str, float] = dict(parsed.get("slowest") or {})
    # Only the portion of the tail BEFORE the canary/segments block holds
    # per-query timings; past it query names reappear as canary medians /
    # marks / frozen refs, which would otherwise be recorded as phantom
    # timings.
    tail = data.get("tail", "")
    cut = min(
        (i for i in (tail.find('"canary"'), tail.find('"segments"')) if i >= 0),
        default=len(tail),
    )
    for name, val in re.findall(r'"([a-z0-9_]+)":\s*(-?\d+\.\d+)', tail[:cut]):
        if name not in not_queries and float(val) < 1e4:
            queries.setdefault(name, float(val))
    out = {
        "sf": data.get("sf"),
        "value": parsed.get("value"),
        "normalized_value": parsed.get("normalized_value"),
        "segment_normalized_value": parsed.get("segment_normalized_value"),
        "queries": queries,
        "_partial": True,
    }
    # timed_action must survive tail recovery: a round-8+ driver-wrapped
    # artifact that lost it would default to "count" downstream and be
    # refused against a full noop-write artifact — fail-closed for a
    # false reason (round-9 ADVICE). The compact last line carries it;
    # the truncated tail is the fallback.
    act = parsed.get("timed_action")
    if act is None:
        m = re.search(r'"timed_action":\s*"([a-z_]+)"', tail)
        act = m.group(1) if m else None
    if act is not None:
        out["timed_action"] = act
    if parsed.get("segment_ref_sec") is not None:
        out["segments"] = {
            "ref_sec": parsed["segment_ref_sec"],
            "normalized_value": parsed.get("segment_normalized_value"),
            "spread": parsed.get("segment_spread"),
        }
    if "host_factor" in parsed:
        out["canary"] = {"host_factor": parsed["host_factor"]}
    return out


def _query_factors(data: dict) -> dict[str, float]:
    """Per-query host factors from the round-7 interleaved segment canary:
    segment i covers positions [i*size, (i+1)*size) of the SORTED query
    names (bench.py's sweep order), and each segment carries the factor of
    its two bracketing canary marks. Queries from a file without segments
    (or in a null-factor segment) fall back to the global factor."""
    seg = data.get("segments") or {}
    factors = seg.get("factors")
    if not factors:
        return {}
    names = sorted(data.get("queries", {}))
    size = int(seg.get("size") or 20)
    out: dict[str, float] = {}
    for i, n in enumerate(names):
        f = factors[min(i // size, len(factors) - 1)]
        if f:
            out[n] = float(f)
    return out


def _resolve_round_ref(ref: str) -> str:
    """Turn a bare round ref (r9 / R09 / 9) into a temp-file path holding
    that round's close-commit BENCH_LOCAL.json; non-refs pass through.
    The round-N close commit is the driver's "round N: verdict/advice/
    correctness/bench" commit, whose BENCH_LOCAL is the round-N driver
    run itself (full per-query map + segment factors)."""
    import subprocess
    import tempfile

    m = re.fullmatch(r"[rR]?0*(\d+)", ref)
    if not m or Path(ref).exists():
        return ref
    rnd = int(m.group(1))
    repo = Path(__file__).resolve().parent.parent
    log = subprocess.run(
        ["git", "-C", str(repo), "log", "--format=%H %s"],
        capture_output=True, text=True, check=True,
    ).stdout
    commit = None
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(rf"round 0*{rnd}: verdict", subject):
            commit = sha
            break
    if commit is None:
        raise SystemExit(
            f"no 'round {rnd}: verdict/...' close commit found — pass an "
            "explicit artifact path instead"
        )
    blob = subprocess.run(
        ["git", "-C", str(repo), "show", f"{commit}:BENCH_LOCAL.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix=f"_bench_r{rnd}.json", delete=False
    )
    tmp.write(blob)
    tmp.close()
    print(f"note: {ref} -> BENCH_LOCAL.json at round-{rnd} close commit "
          f"{commit[:9]} (the round-{rnd} driver run, full per-query map)")
    return tmp.name


def _data_axis_check(old_raw: dict, new_raw: dict) -> list[str]:
    """Compare data_fingerprints blocks when both runs carry them; returns
    the tables whose content changed (empty = identical or uncheckable)."""
    old_fp = old_raw.get("data_fingerprints") or {}
    new_fp = new_raw.get("data_fingerprints") or {}
    if "_error" in old_fp or "_error" in new_fp or not old_fp or not new_fp:
        print("data axis: unchecked (a run lacks fingerprints — pre-r11 "
              "artifact or capture error); 'same data' is an assumption "
              "for this comparison")
        return []
    changed = sorted(
        t for t in set(old_fp) | set(new_fp)
        if (old_fp.get(t) or {}).get("md5") != (new_fp.get(t) or {}).get("md5")
    )
    if changed:
        print(f"data axis: CHANGED tables {', '.join(changed)} — per-query "
              "deltas for queries reading them are NOT code-attributable")
    else:
        print(f"data axis: all {len(old_fp)} input tables md5-identical — "
              "comparison valid on the data axis")
    return changed


def _load(path: str) -> tuple[dict[str, float], float, dict]:
    with open(path) as fh:
        data = _unwrap(json.load(fh))
    factor = float(data.get("canary", {}).get("host_factor", 1.0)) or 1.0
    per_query = _query_factors(data)
    queries = {
        name: t / per_query.get(name, factor)
        for name, t in data.get("queries", {}).items()
        if isinstance(t, (int, float)) and t >= 0
    }
    return queries, factor, data


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=15, help="rows per direction")
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.05,
        help="ignore deltas smaller than this many normalized seconds",
    )
    args = ap.parse_args()
    args.old = _resolve_round_ref(args.old)
    args.new = _resolve_round_ref(args.new)

    old_q, old_f, old_raw = _load(args.old)
    new_q, new_f, new_raw = _load(args.new)
    _data_axis_check(old_raw, new_raw)

    # Cross-reference comparison: the reference defines what "host factor
    # 1.0" means, so two runs frozen against different SEGMENT_REF_SEC
    # values sit on different normalized axes — but segment normalization
    # is LINEAR in the reference (normalized = ref x sum(wall/mark_mean)),
    # so re-expressing a run against the other's reference is an EXACT
    # rescale by new_ref/old_ref, not an approximation. When both sides
    # carry their ref_sec, rescale the OLD run onto the NEW (current)
    # reference and say so; rounds 1-7 count-era runs are still refused
    # below on timed_action, which is the genuinely incomparable axis.
    old_ref = (old_raw.get("segments") or {}).get("ref_sec")
    new_ref = (new_raw.get("segments") or {}).get("ref_sec")
    ref_scale = 1.0
    mixed_scale = False
    if old_ref is not None and new_ref is not None and old_ref != new_ref:
        ref_scale = new_ref / old_ref
        print(
            f"note: old run was normalized against ref_sec={old_ref}, new "
            f"against {new_ref}; rescaling the old run's normalized values "
            f"by {new_ref}/{old_ref} = {ref_scale:.4f} (exact — "
            "normalization is linear in the frozen reference)."
        )
        # Per-query values were divided by their segment factor only when
        # the artifact carries factors; a tail-recovered partial without
        # them holds RAW per-query times, which must not be rescaled.
        if (old_raw.get("segments") or {}).get("factors"):
            old_q = {n: t * ref_scale for n, t in old_q.items()}
        else:
            # Round-10 ADVICE: these raw old values still flow into the
            # shared-total and per-query tables against the new run's
            # factor-corrected ref-scaled values — every downstream ratio
            # mixes scales, so each one is tagged where it prints, not
            # just noted here.
            mixed_scale = True
            print(
                "note: old artifact has no per-segment factors — its "
                "per-query values are raw (factor 1.0) and are NOT "
                "rescaled; only its normalized headline is. Per-query "
                "ratios below are RAW-vs-NORMALIZED (mixed scale) and "
                "are NOT code-attributable."
            )
        seg = old_raw.get("segments") or {}
        for holder, key in ((seg, "normalized_value"),
                            (old_raw, "segment_normalized_value")):
            if isinstance(holder.get(key), (int, float)):
                holder[key] = round(holder[key] * ref_scale, 4)
    # Same guard for the timed action itself: count()-era runs (rounds
    # 1-7, recorded as no timed_action field) never executed the windows/
    # UDF projections/final sorts that the round-8+ noop-write action
    # pays — raw AND normalized times are on different scales.
    old_act = old_raw.get("timed_action", "count")
    new_act = new_raw.get("timed_action", "count")
    if old_act != new_act:
        raise SystemExit(
            f"refusing to compare: runs timed different actions "
            f"(old={old_act}, new={new_act}) — count() plans prune work "
            "the noop-write plans execute (contrib/count_plan_audit.py), "
            "so the walls are not measurements of the same computation."
        )

    for label, path, factor, raw in (
        ("old", args.old, old_f, old_raw),
        ("new", args.new, new_f, new_raw),
    ):
        seg = raw.get("segments") or {}
        note = (
            ""
            if seg or "canary" in raw
            else "  (no canary/segment block: factor=1.0, host noise NOT removed)"
        )
        if raw.get("_partial"):
            note += f"  (driver-wrapped: only {len(old_q if label == 'old' else new_q)} queries recovered from tail)"
        if seg.get("spread") is not None:
            note += f"  (segment spread={seg['spread']} ref_sec={seg.get('ref_sec')})"
        headline = seg.get("normalized_value")
        if headline is None:
            headline = raw.get("segment_normalized_value")
        if headline is None:
            # pre-segment-era artifact: fall back to whatever it has, but
            # LABEL it — the retired bracket normalization is a different
            # (incomparable) scale from segment normalization
            legacy = raw.get("normalized_value", raw.get("value"))
            print(
                f"{label}: {path}  sf={raw.get('sf')}  "
                f"raw_total={raw.get('value')}s  "
                f"legacy_normalized_total={legacy}s (NOT segment-normalized)"
                f"{note}"
            )
            continue
        print(
            f"{label}: {path}  sf={raw.get('sf')}  raw_total={raw.get('value')}s"
            f"  segment_normalized_total={headline}s{note}"
        )

    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    old_shared = sum(old_q[n] for n in shared)
    new_shared = sum(new_q[n] for n in shared)
    scale_tag = " [MIXED SCALE: old=raw, new=normalized]" if mixed_scale else ""
    print(
        f"\nshared queries: {len(shared)}  normalized shared-total: "
        f"{old_shared:.1f}s -> {new_shared:.1f}s ({new_shared / old_shared:.3f}x)"
        f"{scale_tag}"
        if shared
        else "\nno shared queries"
    )
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    deltas = [
        (new_q[n] - old_q[n], new_q[n] / old_q[n] if old_q[n] > 0 else float("inf"), n)
        for n in shared
    ]
    deltas = [d for d in deltas if abs(d[0]) >= args.min_sec]
    deltas.sort(reverse=True)

    def _table(rows, title):
        if not rows:
            print(f"\n{title}: none above {args.min_sec}s")
            return
        print(f"\n{title}{scale_tag}:")
        print(f"{'query':44s} {'old(n)':>8s} {'new(n)':>8s} {'delta':>8s} {'ratio':>7s}")
        row_tag = "  raw-vs-normalized" if mixed_scale else ""
        for delta, ratio, name in rows:
            print(
                f"{name:44s} {old_q[name]:8.3f} {new_q[name]:8.3f} "
                f"{delta:+8.3f} {ratio:6.2f}x{row_tag}"
            )

    _table([d for d in deltas if d[0] > 0][: args.top], "slower (normalized)")
    _table(
        sorted((d for d in deltas if d[0] < 0))[: args.top],
        "faster (normalized)",
    )

    # Round-9 verdict ask #7: when any slower delta clears the attribution
    # floor, the cross-check is MANDATORY protocol, not a suggestion —
    # print the exact command so it cannot be skipped the way the r8->r9
    # driver-tail deltas were.
    above_floor = sorted(
        (n for d, r, n in deltas if d > 0 and r >= ATTRIBUTION_FLOOR),
        key=lambda n: -(new_q[n] / old_q[n]),
    )
    if above_floor:
        repo = Path(__file__).resolve().parent.parent
        flags = " (mixed-scale ratios — cross-check resolves the scale too)" if mixed_scale else ""
        print(
            f"\nabove-floor deltas (>= {ATTRIBUTION_FLOOR}x){flags}: "
            + ", ".join(f"{n} {new_q[n] / old_q[n]:.2f}x" for n in above_floor)
        )
        print(
            "follow-up (round-8 cross-check protocol, one focused "
            "re-measurement per flag):\n"
            f"  PYTHONPATH={repo} python {repo}/contrib/delta_crosscheck.py "
            + " ".join(above_floor)
        )


if __name__ == "__main__":
    main()
