"""Session-scoped cache registry: persist() sites inside query functions
register here so harnesses can drain them between queries.

A query function that persists an intermediate (all-pairs similarity weights,
fingerprint lists, LM scores) cannot unpersist it before returning — the
returned DataFrame still depends on it lazily. Left alone, those cached
partitions accumulate across a session running many graded queries (r4
ADVICE #5). The registry makes the persist scope explicit: the function
calls :func:`scoped_persist`, and the runner (bench.py,
tools/check_correctness.py, or any user loop) calls
:func:`release_scoped_caches` once it has collected the query's result.

Unreleased entries are still bounded by the session lifetime — this is a
cooperative drain, not a leak detector."""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame, storage_level=None, eager: bool = False) -> DataFrame:
    """persist() + register for a later release_scoped_caches() drain.

    ``eager=True`` materializes the cache NOW (one count()). Use it when the
    consumers fan out as CONCURRENT jobs (AQE stage materialization,
    broadcast subqueries): Spark's cache locking is per-block and concurrent
    jobs do not share in-flight stages, so each racing job recomputes the
    whole upstream pipeline of any block it cannot lock — measured 12
    re-runs of a tokenize+explode scan under dedup_ngram_jaccard's 11-way
    job fan-out. One eager pass builds every block once; the racers then
    only read."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _SCOPED.append(df)
    if eager:
        df.count()
    return df


def release_scoped_caches() -> int:
    """Unpersist every registered cache (non-blocking); returns the count.
    Call after the dependent actions (collect/write) have completed."""
    n = len(_SCOPED)
    for df in _SCOPED:
        try:
            df.unpersist(False)
        except Exception:
            pass  # session already stopped: nothing to release
    _SCOPED.clear()
    return n
