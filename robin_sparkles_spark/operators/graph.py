"""Graph analytics over the order network (EXT): PageRank on the
bipartite customer↔supplier graph, Spark-first — per iteration one
equi-join (ranks → edges) and one aggregation (contributions → new
ranks), the canonical distributed PageRank shape. Complements
``dedup.dedup_groups`` (connected components) as the second iterative
graph operator.

Exact-oracle design (the k-means lesson applied statically): the
iteration count is FIXED ({N_PAGERANK_ITER}), so the oracle unrolls
the iterations as chained CTEs — no fit-then-inline needed. Cross-
engine determinism: each neighbor contribution rank/outdeg is one
double division (deterministic); contributions accumulate via
``functions.qsum`` (floor at 2^-40 — exact power-of-two scaling +
floor — then an order-independent DECIMAL(38,0) integer sum; the
scaled per-node sum stays ≤ 2^40 so the final decimal→double
conversion is one correctly-rounded step in BOTH engines). History:
a raw double sum is merge-order-dependent; DECIMAL(38,18) hit the
2^53 conversion double-rounding; DECIMAL(38,12) survived but casts
a full-mantissa double to a fractional decimal, which is itself
engine-divergent at ~ulp probability per term (measured —
functions.qsum docstring); the damping update (1−d)/N + d·Σ is the
same double-op sequence in both engines.

Scale: ranks and edges stay distributed; each iteration shuffles
contributions by destination node (pre-partitioning both by node id
makes it a co-located join on a real cluster). Only the final top-K
reaches the driver. At web scale you'd run to convergence with a
tolerance check (same loop dedup_groups uses); the fixed-iteration
form is what makes the result a gate-checkable number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.barrier import barrier
from ..functions.qsum import qsum, qsum_sql
from ..sources import load_table

N_PAGERANK_ITER = 3
DAMPING = 0.85
PAGERANK_TOP_N = 25


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected customer↔supplier trade edges, as directed
    pairs both ways (node ids: customers even 2k, suppliers odd 2k+1)."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cs = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return cs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        cs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PAGERANK_TOP_N} nodes by PageRank after
    {N_PAGERANK_ITER} damped iterations from a uniform start.
    Output: (node_type, node_key, rank, rk)."""
    # reused every iteration
    edges = barrier(_edges(spark, sf_dir), "groups", "pagerank trade-graph edges")
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # driver scalar: node count only
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - DAMPING) / n_nodes
    for _ in range(N_PAGERANK_ITER):
        contrib = (
            ranks.join(out_deg, ranks.node == out_deg.src)
            .join(edges, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        # every node has in-edges here (undirected expansion), so the
        # aggregate covers the full node set — no dangling-mass term.
        # Contributions accumulate via qsum (floor at 2^-40, exact
        # decimal sum): an earlier DECIMAL(38,12) cast of the raw
        # division was exposed to the cross-engine fractional-cast
        # divergence (functions.qsum docstring); bits=40 keeps the
        # quantization at the old 1e-12 grain and the scaled per-node
        # sum ≤ 2^40 (total rank mass ≤ 1).
        ranks = contrib.groupBy("node").agg(
            (F.lit(base) + F.lit(DAMPING) * qsum(F.col("c"), 40)).alias("rank")
        )
    w = W.orderBy(F.desc("rank"), F.asc("node"))
    return (
        ranks.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PAGERANK_TOP_N)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            (F.col("node") / 2).cast("long").alias("node_key"),
            "rank",
            F.col("rk").cast("long").alias("rk"),
        )
    )


def _iter_cte(i: int) -> str:
    # every float op through explicit DOUBLE casts: a bare 0.85 parses
    # as DECIMAL in DuckDB and decimal arithmetic would diverge from
    # Spark's double ops
    return f"""r{i} AS (
  SELECT e.dst AS node,
         base.b + CAST({DAMPING} AS DOUBLE)
                  * ({qsum_sql('p.rank / d.deg', 40)}) AS rank
  FROM r{i - 1} p
  JOIN deg d ON p.node = d.src
  JOIN edges e ON p.node = e.src
  CROSS JOIN base
  GROUP BY e.dst, base.b
)"""


_ITER_CTES = ",\n".join(_iter_cte(i) for i in range(1, N_PAGERANK_ITER + 1))

# AS MATERIALIZED on the multi-referenced CTEs: DuckDB otherwise
# INLINES `edges` into every chained iteration CTE, recomputing the
# distinct lineitem⋈orders join once per reference — measured 143 s →
# 0.8 s at sf0.1 with bit-identical results. (Spark's side reuses the
# localCheckpoint'd edges; this is the oracle-side twin of that reuse.)
PAGERANK_SQL = f"""
WITH cs AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS MATERIALIZED (
  SELECT c AS src, s AS dst FROM cs
  UNION ALL
  SELECT s AS src, c AS dst FROM cs
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
base AS (
  SELECT (CAST(1.0 AS DOUBLE) - CAST({DAMPING} AS DOUBLE))
           / CAST(COUNT(*) AS DOUBLE) AS b,
         CAST(1.0 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS r0v
  FROM nodes
),
r0 AS (SELECT node, base.r0v AS rank FROM nodes CROSS JOIN base),
{_ITER_CTES},
ranked AS (
  SELECT node, rank,
         ROW_NUMBER() OVER (ORDER BY rank DESC, node ASC) AS rk
  FROM r{N_PAGERANK_ITER}
)
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       CAST(node // 2 AS BIGINT) AS node_key,
       rank,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {PAGERANK_TOP_N}
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "pagerank_trade_graph": (pagerank_trade_graph, PAGERANK_SQL),
}
