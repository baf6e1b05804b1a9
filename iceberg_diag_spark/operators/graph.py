"""Iterative graph algorithms over near-dup pair graphs.

Connected components lives in operators/dedup.py (min-label
propagation); this module adds PageRank — the second iterative shape:
a fixed number of synchronous rounds, each one join + one aggregate,
with `localCheckpoint` truncating lineage so round N's plan does not
embed rounds 1..N-1.

Scale posture: state per round is one (node, rank) row per node and
one (src, dst) row per edge — both shuffle on uniform id keys; the
driver sees only the node count (one scalar). A fixed iteration count
(not convergence detection) keeps the oracle expressible as unrolled
SQL and the job count bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Simplified PageRank on the undirected pair graph (each pair
    contributes both directions). Per round:

        rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u) / deg(u)

    Dangling mass is NOT redistributed (isolated nodes settle at
    (1-d)/N) — the textbook simplification, chosen so the semantics
    are exactly mirrorable in the unrolled-SQL oracle. Output:
    (id_col, pagerank) with rank rounded to 9 decimals.
    """
    both = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    both = both.unionByName(
        both.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = both.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(
        eager=True
    )
    node_ids = nodes.select(F.col(id_col).alias("node")).localCheckpoint(
        eager=True
    )
    n = node_ids.count()
    base = (1.0 - damping) / n
    ranks = node_ids.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            both.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            node_ids.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("node").alias(id_col), F.round("rank", 9).alias("pagerank")
    )


def triangle_count(
    edges: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Global triangle count over an oriented edge list (a < b on
    every edge — the near-dup pair convention). Orientation makes
    each triangle {a<b<c} countable exactly once as the join
    e(a,b) ⋈ e(b,c) ⋈ e(a,c): the standard two-path + closing-edge
    formulation, two shuffles on uniform id keys, never an all-pairs
    product. Duplicate-cluster density shows up as a triangle-to-edge
    ratio near its clique maximum. Output: one row
    (edge_count, triangle_count)."""
    e = edges.select(a_col, b_col).distinct().localCheckpoint()
    e1 = e.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e2 = e.select(F.col(a_col).alias("b"), F.col(b_col).alias("c"))
    e3 = e.select(F.col(a_col).alias("a"), F.col(b_col).alias("c"))
    wedges = e1.join(e2, "b")
    triangles = wedges.join(e3, ["a", "c"])
    return e.agg(F.count(F.lit(1)).alias("edge_count")).crossJoin(
        triangles.agg(F.count(F.lit(1)).alias("triangle_count"))
    )
