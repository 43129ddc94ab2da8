"""Attribute one warm run of a query to driver vs executor time.

Usage: SPARK_GRAFT_SF_DIR=... python tools/driver_attrib.py <query> [...]

For each query: two untimed bench-style runs build the scoped caches, then
the third (warm) run — the one bench.py's min measures — is attributed:

  * wall                — fn(spark, sf_dir) + .count(), end to end
  * build               — Python-side plan construction (fn() call itself,
                          including any fit collects the query does)
  * catalyst            — sum of QueryExecution tracker phases (analysis /
                          optimization / planning) of the counted frame
  * jobs                — merged wall-clock span of the run's jobs from the
                          app status store (executor + scheduling)
  * gap                 — wall - build - jobs: driver work outside any job
                          (codegen, broadcast waits, py4j chatter)

Catalyst time inside fit collects is part of `build` (it happens inside
fn()); `catalyst` covers only the final counted plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bears_spark.caching import release_scoped_caches
from bears_spark.session import get_session


def _job_spans(sc, min_job_id: int) -> list[list[float]]:
    store = sc._jsc.sc().statusStore()
    it = store.jobsList(None)
    spans = []
    for i in range(it.size()):
        j = it.apply(i)
        if j.jobId() < min_job_id:
            continue
        sub, comp = j.submissionTime(), j.completionTime()
        if sub.isDefined() and comp.isDefined():
            spans.append([sub.get().getTime(), comp.get().getTime()])
    spans.sort()
    merged: list[list[float]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return merged


def _max_job_id(sc) -> int:
    store = sc._jsc.sc().statusStore()
    it = store.jobsList(None)
    best = -1
    for i in range(it.size()):
        best = max(best, it.apply(i).jobId())
    return best


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("driver_attrib")
    spark.sparkContext.setLogLevel("ERROR")
    allq = entrymod.queries()
    sc = spark.sparkContext
    for name in names:
        fn = allq[name]
        fn(spark, "/root/testdata/sf0.001").count()  # JIT/codegen warm-up
        release_scoped_caches()
        fn(spark, sf_dir).count()  # run 1: builds scoped caches
        fn(spark, sf_dir).count()  # run 2
        # run 3 = the warm run the bench min measures
        first_new = _max_job_id(sc) + 1
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.count()
        wall = time.perf_counter() - t0
        qe = df._jdf.queryExecution()
        cat_ms = 0.0
        it_ph = qe.tracker().phases().iterator()
        while it_ph.hasNext():
            kv = it_ph.next()
            s = kv._2()
            cat_ms += s.endTimeMs() - s.startTimeMs()
        merged = _job_spans(sc, first_new)
        jobs_s = sum(e - s for s, e in merged) / 1000.0
        n_jobs = len(merged)
        release_scoped_caches()
        print(
            f"{name}: wall={wall:.3f}s build={t_build:.3f}s "
            f"catalyst={cat_ms/1000:.3f}s jobspan={jobs_s:.3f}s "
            f"gap={wall - t_build - jobs_s:.3f}s (merged_spans={n_jobs})",
            flush=True,
        )


if __name__ == "__main__":
    main()
