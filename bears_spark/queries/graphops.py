"""Graded graph queries: PageRank over the customer-supplier trade graph.

The oracle re-implements the identical fixed-iteration PageRank in DuckDB
with the five iterations unrolled as chained CTEs — same uniform start, same
dangling-mass correction, same expression shapes, so the only divergence is
double summation order (~1e-15 relative), absorbed by the 8-decimal output
rounding with ~7 orders of magnitude of margin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bears_spark.localframe import local_df
from bears_spark.queries.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_PR_ITERS = 5
_PR_DAMPING = 0.85


def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by PageRank on the undirected bipartite graph of
    customers and the suppliers their orders touched (edges both ways, so
    no dangling nodes; the dangling path is pytest-covered)."""
    from bears_spark.functions.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).unionByName(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    ranks = pagerank(edges, num_iter=_PR_ITERS, damping=_PR_DAMPING)
    return (
        ranks.select("id", F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), "id")
        .limit(20)
    )


def _pagerank_sql() -> str:
    d = _PR_DAMPING
    sql = f"""
WITH pairs AS (
  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT cust AS src, supp AS dst FROM pairs
  UNION
  SELECT supp AS src, cust AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges UNION SELECT DISTINCT dst FROM edges
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), contrib AS (
  SELECT src, dst, 1.0 / outdeg AS w
  FROM edges JOIN (SELECT src AS s2, CAST(count(*) AS DOUBLE) AS outdeg
                   FROM edges GROUP BY 1) ON src = s2
), it0 AS (
  SELECT id, 1.0 / nn.n AS rank FROM nodes, nn
)"""
    for i in range(_PR_ITERS):
        sql += f""",
dang{i} AS (
  SELECT coalesce(sum(rank), 0.0) AS m
  FROM it{i} WHERE id NOT IN (SELECT src FROM edges)
), inc{i} AS (
  SELECT c.dst AS id, sum(r.rank * c.w) AS mass
  FROM contrib c JOIN it{i} r ON c.src = r.id GROUP BY 1
), it{i + 1} AS (
  SELECT nodes.id,
         (1.0 - {d}) / nn.n + {d} * (coalesce(inc{i}.mass, 0.0) + dang{i}.m / nn.n) AS rank
  FROM nodes LEFT JOIN inc{i} ON nodes.id = inc{i}.id, nn, dang{i}
)"""
    sql += f"""
SELECT id, round(rank, 8) AS rank FROM it{_PR_ITERS}
ORDER BY rank DESC, id LIMIT 20
"""
    return sql


QUERIES["supplier_pagerank"] = supplier_pagerank
ORACLES["supplier_pagerank"] = _pagerank_sql()


# --------------------------------------------------------------------------
# supplier_triangles: triangle count on the supplier co-purchase graph
# (suppliers adjacent iff some order contains lineitems from both). The
# canonical ordered two-join formulation; oracle = the same three-way SQL
# join over canonicalized distinct edges.
def supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bears_spark.functions.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
    )
    return triangle_count(edges)


SUPPLIER_TRIANGLES_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_suppkey AS x, b.l_suppkey AS y
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
)
SELECT count(*) AS n_triangles
FROM pairs e1
JOIN pairs e2 ON e1.y = e2.x
JOIN pairs e3 ON e3.x = e1.x AND e3.y = e2.y
"""

QUERIES["supplier_triangles"] = supplier_triangles
ORACLES["supplier_triangles"] = SUPPLIER_TRIANGLES_SQL


# --------------------------------------------------------------------------
# supplier_two_hop_reach: k-hop neighborhood size (k=2) on the undirected
# supplier co-purchase graph — the classic reachability primitive between
# triangle counting and full BFS. One edge self-join + distinct; the
# distinct-union bounds the pair explosion to actual 2-hop pairs.
def supplier_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
        .distinct()
    )
    e1, e2 = und.alias("e1"), und.alias("e2")
    two = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst")
    )
    reach = (
        und.unionByName(two)
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count("*").alias("reach_2hop"))
    )
    return (
        reach.select(F.col("src").alias("suppkey"), "reach_2hop")
        .orderBy(F.desc("reach_2hop"), "suppkey")
        .limit(20)
    )


TWO_HOP_SQL = """
WITH und AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey <> b.l_suppkey
), two AS (
  SELECT e1.src, e2.dst FROM und e1 JOIN und e2 ON e1.dst = e2.src
), reach AS (
  SELECT src, count(*) AS reach_2hop
  FROM (SELECT DISTINCT src, dst FROM (SELECT * FROM und UNION ALL SELECT * FROM two) WHERE src <> dst)
  GROUP BY src
)
SELECT src AS suppkey, reach_2hop FROM reach ORDER BY reach_2hop DESC, suppkey LIMIT 20
"""

QUERIES["supplier_two_hop_reach"] = supplier_two_hop_reach
ORACLES["supplier_two_hop_reach"] = TWO_HOP_SQL


# --------------------------------------------------------------------------
# Multi-source BFS distance over the supplier co-supply graph (suppliers
# joined by sharing a part): exact hop distance from the seed set (all
# suppliers of the smallest present nationkey — SF-robust) up to 3 hops, via k rounds of frontier-expand
# equi-joins — the standard distributed BFS (no recursion needed; each round
# is one shuffle on the supplier key). The oracle states the same thing as
# an iterated min-distance fixpoint unrolled 3 steps.
def supplier_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(b, "pk")
        .where(F.col("a.sk") != F.col("b.sk"))
        .select(F.col("a.sk").alias("src"), F.col("b.sk").alias("dst"))
        .distinct()
    )
    # seed set must exist at every SF: the smallest nationkey present
    seed_nation = sup.agg(F.min("s_nationkey")).collect()[0][0]
    dist = sup.where(F.col("s_nationkey") == seed_nation).select(
        F.col("s_suppkey").alias("node"), F.lit(0).alias("d")
    )
    frontier = dist
    for hop in (1, 2, 3):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(hop).alias("d"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
        )
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist.groupBy("d").agg(F.count("*").alias("n_suppliers")).orderBy("d")


SUPPLIER_BFS_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
e AS (
  SELECT DISTINCT a.sk AS src, b.sk AS dst
  FROM ps a JOIN ps b ON a.pk = b.pk WHERE a.sk <> b.sk
), d0 AS (
  SELECT s_suppkey AS node FROM supplier
  WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)
), d1 AS (
  SELECT DISTINCT e.dst AS node FROM e JOIN d0 ON e.src = d0.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
), d2 AS (
  SELECT DISTINCT e.dst AS node FROM e JOIN d1 ON e.src = d1.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
    AND e.dst NOT IN (SELECT node FROM d1)
), d3 AS (
  SELECT DISTINCT e.dst AS node FROM e JOIN d2 ON e.src = d2.node
  WHERE e.dst NOT IN (SELECT node FROM d0)
    AND e.dst NOT IN (SELECT node FROM d1)
    AND e.dst NOT IN (SELECT node FROM d2)
)
SELECT d, n_suppliers FROM (
  SELECT 0 AS d, count(*) AS n_suppliers FROM d0
  UNION ALL SELECT 1, count(*) FROM d1
  UNION ALL SELECT 2, count(*) FROM d2
  UNION ALL SELECT 3, count(*) FROM d3
) WHERE n_suppliers > 0 ORDER BY d
"""

QUERIES["supplier_bfs_distance"] = supplier_bfs_distance
ORACLES["supplier_bfs_distance"] = SUPPLIER_BFS_SQL


# --------------------------------------------------------------------------
# supplier_degree_assortativity: degree-assortativity coefficient of the
# supplier co-supply graph — the Pearson correlation of endpoint degrees
# over edges (positive: hubs link to hubs). Degrees come from one groupBy
# over the bounded co-supply edge set; the correlation is closed-form
# moments over edges.
def supplier_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(b, "pk")
        .where(F.col("a.sk") < F.col("b.sk"))
        .select(F.col("a.sk").alias("u"), F.col("b.sk").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    # symmetrize: each edge contributes (du,dv) and (dv,du)
    pairs = ed.select(F.col("du").alias("x"), F.col("dv").alias("y")).unionAll(
        ed.select(F.col("dv").alias("x"), F.col("du").alias("y"))
    )
    m = pairs.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mx"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
    ).first()
    cov = m["mxy"] - m["mx"] * m["mx"]
    var = m["mxx"] - m["mx"] * m["mx"]
    # a regular graph (all endpoint degrees equal, e.g. the complete
    # co-supply graph tiny SFs produce) has zero degree variance —
    # assortativity is undefined; report 0 by convention on both engines
    r = cov / var if var != 0 else 0.0
    return ps.sparkSession.range(1).select(
        F.lit(int(m["n"]) // 2).alias("n_edges"),
        F.round(F.lit(float(m["mx"])), 6).alias("mean_degree_at_edge"),
        F.round(F.lit(float(r)), 6).alias("assortativity"),
    )


SUPPLIER_ASSORT_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
edges AS (
  SELECT DISTINCT a.sk AS u, b.sk AS v
  FROM ps a JOIN ps b ON a.pk = b.pk WHERE a.sk < b.sk
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY 1
),
ed AS (
  SELECT du.deg AS du, dv.deg AS dv
  FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
),
pairs AS (
  SELECT du AS x, dv AS y FROM ed UNION ALL SELECT dv, du FROM ed
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(x) AS mx,
         avg(x * y) AS mxy, avg(x * x) AS mxx
  FROM pairs
)
SELECT n // 2 AS n_edges,
       round(mx, 6) AS mean_degree_at_edge,
       round(CASE WHEN mxx - mx * mx = 0 THEN 0.0
                  ELSE (mxy - mx * mx) / (mxx - mx * mx) END, 6) AS assortativity
FROM m
"""

QUERIES["supplier_degree_assortativity"] = supplier_degree_assortativity
ORACLES["supplier_degree_assortativity"] = SUPPLIER_ASSORT_SQL


# --------------------------------------------------------------------------
# supplier_kcore_peel: 3-round k-core peeling (k=4) of the supplier
# co-supply graph — each round drops nodes with current degree < k and
# recomputes degrees on the induced subgraph; classic distributed peel,
# one degree-groupBy + two semi-joins per round. Reports survivors and
# edge count per round (the oracle unrolls the same 3 rounds).
def supplier_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bears_spark.caching import scoped_persist

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges0 = scoped_persist(
        a.join(b, "pk")
        .where(F.col("a.sk") < F.col("b.sk"))
        .select(F.col("a.sk").alias("u"), F.col("b.sk").alias("v"))
        .distinct()
    )
    k = 4
    out_rows = []
    edges = edges0
    for rnd in (1, 2, 3):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        edges = scoped_persist(
            edges.join(keep.withColumnRenamed("node", "u"), "u", "left_semi").join(
                keep.withColumnRenamed("node", "v"), "v", "left_semi"
            )
        )
        survivors = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .distinct()
            .count()
        )
        n_edges = edges.count()
        out_rows.append((rnd, survivors, n_edges))
    return local_df(ps.sparkSession, 
        out_rows, "round int, n_nodes bigint, n_edges bigint"
    ).orderBy("round")


KCORE_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
e0 AS (
  SELECT DISTINCT a.sk AS u, b.sk AS v
  FROM ps a JOIN ps b ON a.pk = b.pk WHERE a.sk < b.sk
),
d1 AS (
  SELECT node FROM (
    SELECT node, count(*) AS deg FROM (
      SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
    ) GROUP BY 1
  ) WHERE deg >= 4
),
e1 AS (
  SELECT u, v FROM e0
  WHERE u IN (SELECT node FROM d1) AND v IN (SELECT node FROM d1)
),
d2 AS (
  SELECT node FROM (
    SELECT node, count(*) AS deg FROM (
      SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1
    ) GROUP BY 1
  ) WHERE deg >= 4
),
e2 AS (
  SELECT u, v FROM e1
  WHERE u IN (SELECT node FROM d2) AND v IN (SELECT node FROM d2)
),
d3 AS (
  SELECT node FROM (
    SELECT node, count(*) AS deg FROM (
      SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2
    ) GROUP BY 1
  ) WHERE deg >= 4
),
e3 AS (
  SELECT u, v FROM e2
  WHERE u IN (SELECT node FROM d3) AND v IN (SELECT node FROM d3)
)
SELECT 1 AS round,
       (SELECT count(*) FROM (SELECT DISTINCT node FROM (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1))) AS n_nodes,
       (SELECT count(*) FROM e1) AS n_edges
UNION ALL
SELECT 2,
       (SELECT count(*) FROM (SELECT DISTINCT node FROM (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2))),
       (SELECT count(*) FROM e2)
UNION ALL
SELECT 3,
       (SELECT count(*) FROM (SELECT DISTINCT node FROM (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3))),
       (SELECT count(*) FROM e3)
ORDER BY round
"""

QUERIES["supplier_kcore_peel"] = supplier_kcore_peel
ORACLES["supplier_kcore_peel"] = KCORE_SQL
