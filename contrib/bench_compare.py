"""Canary-normalized round-over-round bench comparison.

Usage: python contrib/bench_compare.py OLD.json NEW.json [--top N]

The round-5 verdict established that raw bench totals on this virtualized
host drift up to ~1.2x with zero code change, so raw per-query deltas are
not evidence of regression. bench.py now measures a host-speed canary
(median-of-5 on three frozen queries, pre+post sweep) and records
`canary.host_factor`; this tool divides every timing by its file's factor
before comparing, so the printed ratios are the code-attributable ones.

Files without a canary block (rounds <= 5) normalize by 1.0 and the output
says so — deltas against those rounds carry the old host-noise caveat.
"""

from __future__ import annotations

import argparse
import json
import re


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
        "value", "normalized_value", "host_factor", "rows_per_sec",
        "streaming_rows_per_sec", "wall_sec", "rows", "sf", "p50", "p95",
        "max", "queries_run", "queries_failed",
    }
    queries: dict[str, float] = dict(parsed.get("slowest") or {})
    # Only the portion of the tail BEFORE the canary block holds per-query
    # timings; past it the same query names reappear as canary medians /
    # frozen refs, which would otherwise be recorded as phantom timings
    # for the three canary queries.
    tail = data.get("tail", "").split('"canary"')[0]
    for name, val in re.findall(r'"([a-z0-9_]+)":\s*(-?\d+\.\d+)', tail):
        if name not in not_queries and float(val) < 1e4:
            queries.setdefault(name, float(val))
    out = {
        "sf": data.get("sf"),
        "value": parsed.get("value"),
        "normalized_value": parsed.get("normalized_value"),
        "queries": queries,
        "_partial": True,
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

    old_q, old_f, old_raw = _load(args.old)
    new_q, new_f, new_raw = _load(args.new)

    for label, path, factor, raw in (
        ("old", args.old, old_f, old_raw),
        ("new", args.new, new_f, new_raw),
    ):
        note = "" if "canary" in raw else "  (no canary block: factor=1.0, host noise NOT removed)"
        if raw.get("_partial"):
            note += f"  (driver-wrapped: only {len(old_q if label == 'old' else new_q)} queries recovered from tail)"
        seg = raw.get("segments") or {}
        if seg.get("spread") is not None:
            note += (
                f"  (segment canary: spread={seg['spread']}"
                f" segment_normalized_total={seg.get('normalized_value')}s)"
            )
        print(
            f"{label}: {path}  sf={raw.get('sf')}  raw_total={raw.get('value')}s"
            f"  host_factor={factor}  normalized_total={raw.get('normalized_value', raw.get('value'))}s{note}"
        )

    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    old_shared = sum(old_q[n] for n in shared)
    new_shared = sum(new_q[n] for n in shared)
    print(
        f"\nshared queries: {len(shared)}  normalized shared-total: "
        f"{old_shared:.1f}s -> {new_shared:.1f}s ({new_shared / old_shared:.3f}x)"
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
        print(f"\n{title}:")
        print(f"{'query':44s} {'old(n)':>8s} {'new(n)':>8s} {'delta':>8s} {'ratio':>7s}")
        for delta, ratio, name in rows:
            print(
                f"{name:44s} {old_q[name]:8.3f} {new_q[name]:8.3f} "
                f"{delta:+8.3f} {ratio:6.2f}x"
            )

    _table([d for d in deltas if d[0] > 0][: args.top], "slower (normalized)")
    _table(
        sorted((d for d in deltas if d[0] < 0))[: args.top],
        "faster (normalized)",
    )


if __name__ == "__main__":
    main()
