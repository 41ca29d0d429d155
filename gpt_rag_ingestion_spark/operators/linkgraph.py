"""Link-graph analysis — quantized power-iteration PageRank.

Web-corpus pipelines use link-graph centrality as a document quality
prior (the original Common Crawl filtering signal): a page's rank
feeds the keep/drop and mixture decisions next to the text-quality
features.  PageRank is the canonical "iterative algorithm on a
relational engine" case, and this module shows the Spark-first shape:

- each iteration is ONE join (ranks ⋈ edges on src) + ONE aggregation
  (sum of contributions by dst) + a node-relation left join — no UDF,
  no driver-side graph;
- the rank relation is node-sized, edges shuffle once per iteration
  on src and once on dst; at web scale both are plain AQE-managed
  exchanges and the iteration count is small (O(10));
- ``localCheckpoint`` (opt-in) truncates lineage for long runs so the
  plan does not double per iteration.

Determinism: ranks are scaled integers (``scale`` = 1e12) and every
division is integer ``div`` — floor division of nonnegative longs is
bit-identical in any engine, so an unrolled SQL oracle reproduces the
whole fixed-iteration run exactly (no float accumulation order
anywhere).  The quantization error per division is < 1 at 1e12 scale
— negligible against PageRank's own iteration error.  Dangling-node
mass is dropped (the simple variant); add a dangling-sum term if mass
conservation matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_quantized(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping_q: int = 8500,
    scale: int = 10**12,
    checkpoint: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank; returns (id_col, rank_q) with ranks
    in ``scale`` units.  ``damping_q`` is the damping factor in 1e-4
    units (8500 = 0.85)."""
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(deg, src_col)
    stats = nodes.agg(F.count(F.lit(1)).alias("_n"))
    base = nodes.crossJoin(F.broadcast(stats))
    r = base.selectExpr(id_col, "_n", f"{scale} div _n AS r")
    teleport = f"(({scale} * {10000 - damping_q}) div 10000) div _n"
    for _ in range(iters):
        contrib = (
            e.join(
                r.select(F.col(id_col).alias(src_col), "r"), src_col
            )
            .selectExpr(f"{dst_col} AS {id_col}", "r div outdeg AS c")
            .groupBy(id_col)
            .agg(F.sum("c").alias("s"))
        )
        r = (
            base.join(contrib, on=id_col, how="left")
            .selectExpr(
                id_col,
                "_n",
                f"{teleport} + ({damping_q} * coalesce(s, 0)) div 10000 AS r",
            )
        )
        if checkpoint:
            r = r.localCheckpoint(eager=False)
    return r.select(F.col(id_col), F.col("r").alias("rank_q"))


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Global triangle count of the undirected graph — one row
    ``(n_triangles)``.

    Canonicalizes each edge to (lo, hi), drops loops, dedups, then
    enumerates each triangle exactly once as a < b < c via two hash
    equi-joins (a,b)⋈(b,c)⋈(a,c).  Graph-analytics staple (clustering
    coefficient, community structure as a corpus-quality signal on
    link graphs); at web scale the standard refinement is
    degree-ordered orientation — same plan, orientation by (degree,
    id) instead of id — which bounds the join fan-out by arboricity.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
