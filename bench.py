"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed once warm-up-free per run but the session itself is
shared, so JVM/codegen startup is excluded from per-query numbers via a
throwaway warm-up action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from bears_spark.session import get_session

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM / parquet footer cache so q1 isn't charged for session start
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    all_qs = entrymod.queries()
    names = getattr(entrymod, "HEADLINE", None) or list(all_qs)
    qs = {n: all_qs[n] for n in names}
    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
    total = round(time.perf_counter() - t_total0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
