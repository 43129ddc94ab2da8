"""Empirical scaling curves: time each HEADLINE query at two scale factors
and print the wall-clock ratio — the measured answer to "does this plan's
cost grow like the data, or worse?".

    python tools/scale_curve.py [sf_small_dir] [sf_big_dir]

A query whose ratio tracks the 10x data growth (or sits below it, because
fixed JVM/plan overhead dominates at the small SF) scales; a ratio far above
the data growth means a super-linear stage (pairwise blow-up, one-task
window, driver collect) — the audit's failure modes, measured. Output is a
markdown table for SCALE.md. Best-of-2 per (query, SF) after a shared
sf0.001 warm-up; ambient noise still applies, so read ratios as magnitudes,
not third-digit truth.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bears_spark.caching import release_scoped_caches  # noqa: E402
from bears_spark.session import get_session  # noqa: E402


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")

    qs = {n: entrymod.queries()[n] for n in entrymod.HEADLINE}
    warm = "/root/testdata/sf0.001"
    for fn in qs.values():
        try:
            fn(spark, warm if os.path.isdir(warm) else small).count()
        except Exception as exc:
            print(f"# warmup failed: {exc}", file=sys.stderr)
    release_scoped_caches()

    def best2(fn, sf_dir: str) -> float:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        release_scoped_caches()
        return min(runs)

    lbl_s, lbl_b = os.path.basename(small.rstrip("/")), os.path.basename(big.rstrip("/"))
    print(f"| query | {lbl_s} s | {lbl_b} s | ratio (data 10x) |")
    print("|---|---|---|---|")
    for name, fn in qs.items():
        try:
            ts, tb = best2(fn, small), best2(fn, big)
            print(f"| {name} | {ts:.3f} | {tb:.3f} | {tb / ts:.1f}x |")
        except Exception as exc:
            print(f"| {name} | FAILED | {type(exc).__name__} | |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
