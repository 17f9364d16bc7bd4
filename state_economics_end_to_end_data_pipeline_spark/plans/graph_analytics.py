"""Iterative graph computation on DataFrames.

Complements operators/dedup.py's connected-components (used for
near-dup cluster resolution) with the other canonical iterative shape:
PageRank. The loop lives in the driver as plan construction only -- each
iteration is a join + aggregate over the edge list, the data never
leaves the cluster, and the edge list is computed once and cached.
The oracle unrolls the same three iterations as chained CTEs, with every
cross-row sum routed through decimal so both engines produce identical
doubles (float addition order is partition-dependent otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.readers import read_parquet_table as t
from . import register

_DAMP = 0.85


def _pair_edges_sql() -> str:
    """Undirected co-occurrence edges (basket pairs in >=3 orders),
    emitted in both directions."""
    return """
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n_nodes FROM nodes)
    """


def _iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration: decimal-exact contribution sum."""
    # bare numeric literals parse as DECIMAL in DuckDB; cast to DOUBLE so
    # both engines run the identical IEEE expression
    return f"""
    {out} AS (
      SELECT nodes.node,
             CAST({(1 - _DAMP)!r} AS DOUBLE) / n.n_nodes
               + CAST({_DAMP!r} AS DOUBLE)
                 * COALESCE(CAST(s.contrib AS DOUBLE), 0.0) AS rank
      FROM nodes CROSS JOIN n
      LEFT JOIN (
        SELECT e.dst AS node,
               SUM(CAST(p.rank / d.outdeg AS DECIMAL(38,18))) AS contrib
        FROM edges e
        JOIN {prev} p ON e.src = p.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s ON s.node = nodes.node
    )
    """


@register(
    "pagerank_parts_3iter",
    oracle=f"""
    WITH {_pair_edges_sql()},
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n.n_nodes AS rank
           FROM nodes CROSS JOIN n),
    {_iter_sql('r0', 'r1')},
    {_iter_sql('r1', 'r2')},
    {_iter_sql('r2', 'r3')}
    SELECT node AS part, round(rank, 12) AS rank FROM r3
    """,
)
def pagerank_parts_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) on the part co-occurrence graph.
    The iterative pattern for DataFrame engines: edge list built once and
    cached, each iteration joins current ranks to edges and re-aggregates
    -- lineage grows linearly, so production loops checkpoint every ~10
    rounds to cut it. Contribution sums are decimal-exact, making the
    float trajectory identical across engines and partitionings."""
    li = t(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = basket.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, (a.k == b.k) & (F.col("src") < F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("src", "dst")
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    nodes = edges.select(F.col("src").alias("node")).distinct().cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = nodes.count()  # scalar: sizes the teleport term, O(1) result

    ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(
                F.sum((F.col("rank") / F.col("outdeg")).cast("decimal(38,18)"))
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left_outer"
        ).select(
            "node",
            (
                F.lit((1 - _DAMP) / n_nodes)
                + F.lit(_DAMP) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select(F.col("node").alias("part"), F.round("rank", 12).alias("rank"))
