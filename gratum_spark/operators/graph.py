"""Iterative graph analytics: PageRank with engine-exact arithmetic.

Beyond-reference capability (the published PageRank recurrence —
Brin & Page 1998 — over a DataFrame edge list). In a curation
pipeline this is the domain-authority weighting step: rank hosts in
the link graph, weight or threshold documents by their host's rank.

Scale + determinism design:
- the graph stays distributed end to end: one edge table, per-node
  out-degrees, and each iteration is join(ranks, edges) -> groupBy(dst)
  — the canonical shuffle-per-iteration shape, no adjacency collected
  anywhere;
- a FIXED iteration count keeps the plan finite and makes the whole
  computation expressible as unrolled SQL — which is how the driver
  oracle checks it exactly, not just rows-only (cf. the min-label
  propagation in dedup.connected_components, whose oracle relies on a
  data-shape shortcut instead);
- per-node incoming sums accumulate in DECIMAL(38,12) (like
  functions.dot_decimal): double sums would depend on partition
  order and engine, decimal sums are exact and order-independent, so
  every engine produces bit-identical ranks at every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

_DEC = "decimal(38,12)"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iters: int = 5,
    undirected: bool = True,
) -> DataFrame:
    """PageRank over an edge list; returns (node, rank).

    ``undirected=True`` doubles each edge (a->b, b->a), which also
    guarantees every node has out-degree >= 1 — no dangling-mass
    redistribution term needed. Nodes are whatever appears in the edge
    list. Rank updates follow r' = (1-d)/N + d * sum(r_in / outdeg_in)
    with the incoming sum in exact decimal.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # every iteration re-joins the edge table; without a lineage cut
    # Catalyst re-derives it (scan + distinct) once per iteration and
    # the plan grows superlinearly in n_iters. Eager localCheckpoint
    # (MEMORY_AND_DISK blocks, ContextCleaner-released) — same trade as
    # connected_components; call setCheckpointDir + .checkpoint() for a
    # replayable cut on a real cluster.
    # the static side is also PRE-PARTITIONED on the join key before
    # the cut (the Pregel trade: co-locate the graph once, shuffle only
    # the ranks each superstep) — the checkpointed LogicalRDD keeps the
    # hashpartitioning, so no iteration re-shuffles the edge table
    e = e.distinct().repartition("src").localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).distinct()
    n_total = nodes.agg(F.count("*").cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(n_iters):
        contrib = (
            ranks.join(e, ranks.node == e.src)
            .join(deg, on="src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg").cast("double")).cast(_DEC).alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").cast("double").alias("in_sum"))
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n")
                    + F.lit(damping) * F.col("in_sum")
                ).alias("rank"),
            )
        )
    return ranks
