"""Compare two bench JSON artifacts query by query, fingerprint-aware.

Usage: python tools/bench_compare.py BENCH_rA.json BENCH_rB.json [threshold]

Prints per-query ratios (B/A) for the intersection, the comparable-total
ratio, and — the part that matters — whether the two runs used IDENTICAL
testdata: the harness regenerates /root/testdata between rounds, so when
the `testdata_fingerprint` fields differ, per-query deltas mix code changes
with data-layout changes (row-group boundaries, value order) on top of this
host's ±30-40% ambient noise, and any apparent regression must be A/B'd
in-session before it is believed (VERDICT r9 "What's wrong" #2).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    rec = json.load(open(path))
    # the round driver wraps bench.py's line: {n, rc, sf, parsed: {...}}
    if "parsed" in rec and isinstance(rec["parsed"], dict):
        rec = rec["parsed"]
    return rec


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    fa, fb = a.get("testdata_fingerprint"), b.get("testdata_fingerprint")
    if fa is None or fb is None:
        print("fingerprint: UNKNOWN (at least one run predates the field) — "
              "treat per-query deltas as layout-confounded")
    elif fa == fb:
        print(f"fingerprint: MATCH ({fa}) — runs used identical testdata bytes")
    else:
        print(f"fingerprint: MISMATCH ({fa} vs {fb}) — testdata was regenerated; "
              f"per-query deltas are NOT attributable to code without an "
              f"in-session A/B")
    qa, qb = a.get("queries", {}), b.get("queries", {})
    common = sorted(set(qa) & set(qb))
    if not common:
        print("no common queries")
        return 1
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"comparable-{len(common)} total: {ta:.2f}s -> {tb:.2f}s "
          f"= {tb / ta:.2f}x" if ta else "zero base total")
    flagged = []
    for q in common:
        if qa[q] <= 0:
            continue
        r = qb[q] / qa[q]
        if r >= threshold or r <= 1 / threshold:
            flagged.append((r, q))
    for r, q in sorted(flagged, reverse=True):
        print(f"  {q}: {qa[q]:.3f}s -> {qb[q]:.3f}s = {r:.2f}x")
    if not flagged:
        print(f"  no per-query ratio beyond {threshold}x in either direction")
    return 0


if __name__ == "__main__":
    sys.exit(main())
