"""Bench-methodology timing of named queries: per block, 3 runs with scoped
caches alive across runs (matching bench.py), reporting each run and the min.

Usage: SPARK_GRAFT_SF_DIR=... python tools/time_query.py <query> [...] [--blocks N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bears_spark.caching import release_scoped_caches
from bears_spark.session import get_session


def main() -> None:
    args = sys.argv[1:]
    blocks = 3
    if "--blocks" in args:
        i = args.index("--blocks")
        blocks = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("time_query")
    spark.sparkContext.setLogLevel("ERROR")
    allq = entrymod.queries()
    for name in args:
        fn = allq[name]
        fn(spark, "/root/testdata/sf0.001").count()  # warm-up (JIT/codegen)
        release_scoped_caches()
        for b in range(blocks):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            release_scoped_caches()
            print(
                f"{name} block{b}: min={min(runs):.3f}s runs={', '.join(f'{r:.3f}' for r in runs)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
