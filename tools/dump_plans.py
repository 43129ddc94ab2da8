"""Capture `.explain("formatted")` for headline queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [<suffix> [query ...]]
  tag     -> plans/<tag>/<query>_<suffix>.txt  (suffix default "before")
  query   -> subset of HEADLINE (default: all headline queries)

The judge reads these files to check plan claims (Exchange count, join
strategy, PushedFilters, Python-eval nodes) against the code.
"""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bears_spark.session import get_session


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or entrymod.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    allq = entrymod.queries()
    from bears_spark.caching import release_scoped_caches

    for name in names:
        fn = allq[name]
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            with open(path, "w") as f, redirect_stdout(f):
                df.explain("formatted")
            print(f"wrote {path}", file=sys.stderr)
        except Exception as exc:
            print(f"# {name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
        release_scoped_caches()


if __name__ == "__main__":
    main()
