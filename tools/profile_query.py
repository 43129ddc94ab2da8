"""Per-stage profile of one or more declared queries via the UI REST API.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_query.py <query> [...]

Runs each query once (after an sf0.001 warm-up) with the UI enabled, then
prints every stage of that run sorted by executor run time: wall time,
task count, input bytes, shuffle read/write bytes, and the stage's callsite.
This is the guide-§1 "empirical" loop without a browser: it answers where
the time actually goes (scan vs shuffle vs Python boundary) per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bears_spark.session import get_session


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    # --warm: run the query twice first WITHOUT draining scoped caches, then
    # profile the third (warm-cache) run — the one bench.py's min measures.
    warm = "--warm" in names
    if warm:
        names.remove("--warm")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("profile", **{"spark.ui.enabled": "true", "spark.ui.port": "4049"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}"
    app_id = spark.sparkContext.applicationId
    allq = entrymod.queries()
    from bears_spark.caching import release_scoped_caches

    for name in names:
        fn = allq[name]
        fn(spark, "/root/testdata/sf0.001").count()  # warm-up
        release_scoped_caches()
        if warm:
            fn(spark, sf_dir).count()
            fn(spark, sf_dir).count()
        before = {s["stageId"] for s in _get(f"{ui}/api/v1/applications/{app_id}/stages")}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        release_scoped_caches()
        stages = [
            s
            for s in _get(f"{ui}/api/v1/applications/{app_id}/stages")
            if s["stageId"] not in before and s["status"] == "COMPLETE"
        ]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in stages)
        print(f"\n=== {name}: wall {wall:.3f}s, {len(stages)} stages, executor-time sum {total_run/1e3:.1f}s")
        print(f"{'stage':>5} {'run_ms':>8} {'cpu_ms':>8} {'tasks':>5} {'in_MB':>7} {'shR_MB':>7} {'shW_MB':>7}  name")
        for s in stages[:14]:
            print(
                f"{s['stageId']:>5} {s.get('executorRunTime', 0):>8} {int((s.get('executorCpuTime') or 0)/1e6):>8}"
                f" {s.get('numCompleteTasks', 0):>5}"
                f" {(s.get('inputBytes') or 0)/1e6:>7.1f}"
                f" {(s.get('shuffleReadBytes') or 0)/1e6:>7.1f}"
                f" {(s.get('shuffleWriteBytes') or 0)/1e6:>7.1f}"
                f"  {s.get('name', '')[:70]}"
            )


if __name__ == "__main__":
    main()
