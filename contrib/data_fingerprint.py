"""Capture + diff the per-round parquet data fingerprints (round-11 ask #3).

The driver regenerates /root/testdata each round, so any cross-round
per-query bench claim silently assumes "same data". Round 10 recorded the
first fingerprint snapshot (contrib/rollup_forensics_r10.json,
data_fingerprints block: md5 + pyarrow row-group metadata per table).
This tool makes the check a one-command protocol step:

    python contrib/data_fingerprint.py capture OUT.json [--sf-dir DIR]
    python contrib/data_fingerprint.py diff OLD.json NEW.json

`capture` writes {"sf_dir", "data_fingerprints", "captured_utc"}.
`diff` accepts either this tool's own output or any artifact holding a
top-level "data_fingerprints" block (e.g. rollup_forensics_r10.json) and
prints a per-table verdict. Exit code 0 = content-identical (md5 match
for every table on both sides), 1 = any md5 mismatch or table-set drift.
mtime and created_by differences alone are reported but do NOT fail: the
driver rewriting byte-identical files is a non-event for bench claims.

Protocol rule this enforces (SCALE.md round-10 forensics): no cross-round
per-query delta may be attributed to code until the data axis is pinned —
a changed md5 on a table a query reads voids the comparison for it.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def capture(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    out = {}
    for name in sorted(os.listdir(sf_dir)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(sf_dir, name)
        md5 = hashlib.md5(open(p, "rb").read()).hexdigest()
        meta = pq.ParquetFile(p).metadata
        out[name] = {
            "md5": md5,
            "bytes": os.path.getsize(p),
            "mtime_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(os.path.getmtime(p))
            ),
            "num_rows": meta.num_rows,
            "num_row_groups": meta.num_row_groups,
            "created_by": meta.created_by,
        }
    return out


def _load_fps(path: str) -> dict:
    data = json.load(open(path))
    fps = data.get("data_fingerprints")
    if fps is None:
        raise SystemExit(f"{path}: no data_fingerprints block")
    return fps


def diff(old_path: str, new_path: str) -> int:
    old, new = _load_fps(old_path), _load_fps(new_path)
    failed = False
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            print(f"DRIFT  {name}: present only in "
                  f"{'new' if o is None else 'old'}")
            failed = True
            continue
        if o["md5"] != n["md5"]:
            # .get: bench.py's in-artifact blocks carry only md5+num_rows
            print(f"CHANGED {name}: md5 {o['md5']} -> {n['md5']} "
                  f"(rows {o.get('num_rows')} -> {n.get('num_rows')}, "
                  f"bytes {o.get('bytes')} -> {n.get('bytes')})")
            failed = True
        else:
            notes = []
            if o.get("mtime_utc") != n.get("mtime_utc"):
                notes.append("rewritten byte-identical")
            if o.get("created_by") != n.get("created_by"):
                notes.append(f"writer {o['created_by']!r} -> {n['created_by']!r}")
            print(f"SAME   {name}" + (f"  ({'; '.join(notes)})" if notes else ""))
    print("VERDICT:", "DATA CHANGED — cross-round per-query deltas void for "
          "queries reading changed tables" if failed
          else "data content identical — cross-round comparison valid")
    return 1 if failed else 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    cap = sub.add_parser("capture")
    cap.add_argument("out")
    cap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    d = sub.add_parser("diff")
    d.add_argument("old")
    d.add_argument("new")
    args = ap.parse_args()
    if args.cmd == "capture":
        payload = {
            "sf_dir": args.sf_dir,
            "data_fingerprints": capture(args.sf_dir),
            "captured_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%S+00:00", time.gmtime()
            ),
        }
        json.dump(payload, open(args.out, "w"), indent=1)
        print(f"wrote {args.out} ({len(payload['data_fingerprints'])} tables)")
        return 0
    return diff(args.old, args.new)


if __name__ == "__main__":
    sys.exit(main())
