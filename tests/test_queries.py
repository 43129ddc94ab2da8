"""Smoke tests for every declared query at sf0.001 (full oracle comparison is
tools/check_correctness.py / the driver's t2 gate at sf0.01)."""

import pytest

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 6
    assert rows[0]["count_order"] > 0


def test_queries_and_oracles_aligned():
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())
    assert set(entrymod.HEADLINE) <= set(entrymod.queries())


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    # schema must be stable (no unresolved columns)
    assert df.columns
