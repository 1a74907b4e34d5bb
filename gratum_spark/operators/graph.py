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

    ``undirected=True`` doubles each edge (a->b, b->a), which
    guarantees every node has in- and out-degree >= 1 — no dangling
    nodes, no zero-in-degree nodes, and the recurrence needs no
    correction terms. Nodes are whatever appears in the edge list
    (either endpoint). Rank updates follow
    r' = (1-d)/N + d * (sum(r_in / outdeg_in) + dangling_mass/N)
    with the incoming sum in exact decimal.

    Directed mode handles the two shapes the plain recurrence gets
    wrong: a node nobody links to keeps its (1-d)/N floor every
    iteration (the node set is left-joined back, never rebuilt from the
    contributions), and the rank of sink nodes (out-degree 0) is
    redistributed uniformly — the standard dangling-mass term (Brin &
    Page 1998 §2.1.1) — so total rank mass stays exactly 1.
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
    e = e.distinct().repartition("src")
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # r15: the out-degree FOLDS INTO the checkpointed edge table
    # (src, dst, deg) instead of living in a second checkpointed table
    # joined every superstep — one extra long per edge row buys 5 fewer
    # SortMergeJoins (+10 sorts) over 5 iterations (measured plan:
    # 10 SMJ/20 Sort -> 5 join/10 Sort, then 0 sorts with the SHJ hint
    # below). deg is computed on e's src-partitioning, so the fold costs
    # no extra exchange at build.
    ed = e.join(deg, on="src").localCheckpoint(eager=True)
    if undirected:
        # doubled edges ⇒ every node appears as src; no dangling nodes
        nodes = ed.select(F.col("src").alias("node")).distinct()
    else:
        # sinks (out-degree 0) are flagged ONCE at build time and the
        # flag rides along in the ranks frame, so each superstep's
        # dangling mass is a single aggregate over the already-
        # checkpointed ranks — no per-iteration semi-join against a
        # dangling table (the r7 shape paid one join + one action per
        # superstep for the same scalar). A node is a sink iff it never
        # appears as src of the checkpointed edge table.
        srcs = ed.select(F.col("src").alias("__s__")).distinct()
        nodes = (
            ed.select(F.col("src").alias("node"))
            .unionByName(ed.select(F.col("dst").alias("node")))
            .distinct()
            .join(srcs, F.col("node") == F.col("__s__"), "left")
            .select("node", F.col("__s__").isNull().alias("is_sink"))
            .localCheckpoint(eager=True)
        )
    # the 1-row N scalar is cross-joined (broadcast) into EVERY
    # iteration's rank update; without its own lineage cut the unrolled
    # plan re-derives it (edge scan + distinct + agg = a whole job
    # chain) once per iteration — measured ~5 extra jobs over 5
    # iterations at sf0.1. Eager localCheckpoint pins the single row.
    n_total = nodes.agg(F.count("*").cast("double").alias("n")).localCheckpoint(
        eager=True
    )
    if undirected:
        ranks = nodes.crossJoin(F.broadcast(n_total)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("rank")
        )
    else:
        ranks = nodes.crossJoin(F.broadcast(n_total)).select(
            "node", "is_sink", (F.lit(1.0) / F.col("n")).alias("rank")
        )
    for _ in range(n_iters):
        # SHUFFLE_HASH on the ranks side: both sides are already
        # hash-partitioned on the join key (ed by construction, ranks by
        # the previous superstep's groupBy), so a sort-merge join would
        # re-sort the full edge table every iteration for nothing. The
        # hash build side is the ranks partition slice — the node table,
        # strictly smaller than the edge table it probes (guide §3.1's
        # deliberate shuffled-hash pick).
        r = ranks.hint("shuffle_hash")
        contrib = (
            r.join(ed, r.node == ed.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg").cast("double")).cast(_DEC).alias("c"),
            )
        )
        in_sums = contrib.groupBy("node").agg(
            F.sum("c").cast("double").alias("in_sum")
        )
        if undirected:
            # undirected: in-degree >= 1 everywhere, so the aggregate
            # covers every node and there is no dangling mass — keep
            # the original (oracle-exact) two-term update
            ranks = (
                in_sums.crossJoin(F.broadcast(n_total))
                .select(
                    "node",
                    (
                        (F.lit(1.0) - F.lit(damping)) / F.col("n")
                        + F.lit(damping) * F.col("in_sum")
                    ).alias("rank"),
                )
            )
        else:
            # directed: the 1-row dangling-mass scalar (decimal-exact
            # like the contribution sums, so bit-identical to the r7
            # semi-join shape) is one filtered aggregate over the
            # checkpointed ranks via the is_sink flag; it broadcasts
            # back onto the node set, and nodes with no inbound links
            # keep their (1-d)/N floor via the left join + coalesce
            dmass = ranks.agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("is_sink"), F.col("rank").cast(_DEC))
                    ).cast("double"),
                    F.lit(0.0),
                ).alias("dm")
            )
            ranks = (
                nodes.join(in_sums, on="node", how="left")
                .crossJoin(F.broadcast(n_total))
                .crossJoin(F.broadcast(dmass))
                .select(
                    "node",
                    "is_sink",
                    (
                        (F.lit(1.0) - F.lit(damping)) / F.col("n")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("in_sum"), F.lit(0.0))
                            + F.col("dm") / F.col("n")
                        )
                    ).alias("rank"),
                )
                # ranks feed the next iteration TWICE (contrib + dmass);
                # without a per-superstep cut the unrolled plan doubles
                # per iteration
                .localCheckpoint(eager=True)
            )
    return ranks.select("node", "rank")
