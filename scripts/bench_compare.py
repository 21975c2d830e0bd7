#!/usr/bin/env python
"""Compare two bench result files per query: the regression-tracking
companion of bench.py.

Accepts either bench.py's raw one-line JSON ({"queries": {...}}) or the
driver's BENCH_r{N}.json wrapper ({"parsed": {"queries": {...}}}).
Prints queries sorted by ratio (new/old), flagging >1.5x as REGRESSED
and >2x loudly — BASELINE.md documents ±20-30% box jitter, so compare
medians across runs before acting on a single flag.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--top 20]

Blind spot, by convention (VERDICT r6 #2): the bench runs with the
fingerprint-keyed artifacts (knn_edge_artifact, minhash_pair_artifact)
WARM, so this compare guards only the read path.  A regression in the
artifact BUILD path is invisible here — run
`python scripts/artifact_build_probe.py` once per round and compare
against the build-cost table in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    # driver wrappers sometimes truncate the line into a "tail" string —
    # salvage whatever name/seconds pairs survive (partial, but enough
    # for per-query ratios)
    if isinstance(d.get("tail"), str):
        import re

        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', d["tail"])
        qs = {k: float(v) for k, v in pairs if not k.startswith(("sf", "value"))}
        if qs:
            print(f"note: {path} held only a truncated tail; "
                  f"salvaged {len(qs)} queries")
            return qs
    raise SystemExit(f"{path}: no 'queries' map found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    old = load_queries(args.old)
    new = load_queries(args.new)
    shared = sorted(set(old) & set(new))
    if not shared:
        raise SystemExit("no shared queries between the two files")

    rows = []
    for name in shared:
        o, n = old[name], new[name]
        rows.append((n / o if o else float("inf"), name, o, n))
    rows.sort(reverse=True)

    print(f"{len(shared)} shared queries; old total "
          f"{sum(old[q] for q in shared):.1f}s -> new total "
          f"{sum(new[q] for q in shared):.1f}s")
    flagged = 0
    for ratio, name, o, n in rows[: args.top]:
        mark = "  <<< REGRESSED >2x" if ratio > 2 else (
            "  << regressed >1.5x" if ratio > 1.5 else "")
        if mark:
            flagged += 1
        print(f"{name:40s} {o:7.2f}s -> {n:7.2f}s  {ratio:5.2f}x{mark}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): {', '.join(only_new)}")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
