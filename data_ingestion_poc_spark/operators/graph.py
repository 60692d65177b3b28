"""Iterative graph analytics over relationally-derived edges (round 4b).

`dedup_clusters` (llm/dedup.py) already covers connected components; this
module adds the other canonical iterative-dataflow shape, PageRank, over
the customer<->supplier bipartite graph implied by lineitem ⋈ orders.
PageRank-style propagation is what a training-data pipeline runs over a
web-crawl link graph for quality signals (Common Crawl's harmonic
centrality, Google's original ranking) — the graph here is small, but the
plan shape is the 100 TB one: edges shuffle on their join key once per
iteration, ranks stay (node, value) pairs, nothing ever collects.

Fixed-point arithmetic, deliberately: ranks are BIGINT micro-units
(TOTAL_MASS = 1e12 split over N nodes) and every update is integer
multiply/floor-divide. Floating-point PageRank sums contributions in
engine-dependent order, so no cross-engine value oracle can pin it
bit-exactly; over integers, addition is associative and both engines
compute IDENTICAL states every iteration — the same determinism-over-
convenience choice the reference makes for its digest-based dedup
(child.py:174-191), applied to an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

#: Total rank mass in integer micro-units, and the damping factor 0.85
#: expressed as the exact rational 17/20 so both engines floor-divide.
TOTAL_MASS = 1_000_000_000_000
PAGERANK_ITERS = 3

_EDGES_SQL = """
    edges0 AS (
      SELECT 'c' || CAST(o.o_custkey AS VARCHAR)  AS src,
             's' || CAST(l.l_suppkey AS VARCHAR)  AS dst,
             CAST(COUNT(*) AS BIGINT)             AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst, w FROM edges0
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM edges0
    ),
    outsum AS (SELECT src, SUM(w) AS wsum FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes)
"""


def _rank_step_sql(prev: str, out: str) -> str:
    """One unrolled fixed-point PageRank round as SQL CTEs."""
    return f"""
    contrib_{out} AS (
      SELECT e.dst AS node,
             SUM((r.rank_units * e.w) // o.wsum) AS inflow
      FROM edges e
      JOIN {prev} r ON r.node = e.src
      JOIN outsum o ON o.src = e.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT n.node,
             CAST((150000000000 // (SELECT n FROM nn))
                  + (17 * COALESCE(c.inflow, 0)) // 20 AS BIGINT)
               AS rank_units
      FROM nodes n
      LEFT JOIN contrib_{out} c ON c.node = n.node
    )
"""


_PAGERANK_ORACLE = (
    "WITH "
    + _EDGES_SQL
    + ",\n    r0 AS (SELECT node, CAST(" + str(TOTAL_MASS) + " // (SELECT n FROM nn)"
    " AS BIGINT) AS rank_units FROM nodes),"
    + _rank_step_sql("r0", "r1")
    + ","
    + _rank_step_sql("r1", "r2")
    + ","
    + _rank_step_sql("r2", "r3")
    + """
    SELECT node, rank_units FROM r3
    """
)


@register("graph_pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 17/20, 3 rounds) over the undirected
    customer<->supplier purchase graph, in exact BIGINT micro-units.

    Plan shape per iteration: edges ⋈ ranks on src (the edge table
    re-partitions ONCE and its partitioning is reused every round —
    ranks are the small, changing side), contributions hash-aggregate on
    dst (map-side combinable integer sums), left join back to the node
    list for teleport-only nodes. Nothing leaves the cluster; the
    iteration count is fixed, so unlike dedup_clusters there is no
    convergence collect at all. At web-graph scale the same loop runs
    with ranks checkpointed every few rounds to truncate lineage —
    dedup_clusters' localCheckpoint discipline."""
    t = load(spark, sf_dir)
    e0 = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).persist()
    outsum = edges.groupBy("src").agg(F.sum("w").alias("wsum"))
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n = nodes.count()  # scalar graph cardinality, one bounded driver fetch
    base = 150_000_000_000 // n
    ranks = nodes.select(
        "node", F.lit(TOTAL_MASS // n).cast("long").alias("rank_units")
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outsum, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_units * w) div wsum").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr("17 * coalesce(inflow, 0L) div 20")
            ).cast("long").alias("rank_units"),
        )
    return ranks
