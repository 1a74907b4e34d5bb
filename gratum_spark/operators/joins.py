"""Temporal and range joins — beyond-reference join shapes.

The reference's only join is an equality hash join with the right side
cached in memory (Pipeline.groovy:385-427); as-of and range/interval
joins are the non-equi shapes a feature/training-data pipeline actually
needs (point-in-time lookups, banding, interval containment).

Scale posture:
  * ``asof_join`` is ONE shuffle on the key — union both sides, sort
    within key-partitions, carry the right payload forward with
    ``last(ignorenulls)``. Never a per-left-row range probe, never a
    nested-loop join, state is O(1) per row during the window scan.
  * ``range_join`` broadcasts the (small) interval side — each task
    scans its partition against the in-memory band table, no shuffle of
    the big side.
  * ``interval_join_bucketed`` handles big×big point-in-interval joins
    by quantizing to grid cells and equi-joining on the cell — a hash
    join with fan-out interval_width/bucket_width instead of O(n·m).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "interval_join_bucketed", "salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) left side's key with a
    random shard in [0, n_salts) and explode the right side across all
    shards, so one hot key spreads over ``n_salts`` reducers instead of
    one straggler task.

    AQE's skew-join split (enabled in session.py) handles most skew
    after the fact; explicit salting is for the pathological case — one
    key holding a double-digit percentage of all rows — where even a
    split partition's sort/build side blows past executor memory. Cost:
    the right side is replicated n_salts×, so keep it the smaller input.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn("_salt", (F.rand(42) * n_salts).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l.join(r, on=keys + ["_salt"], how=how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for each left row, attach ``value_cols`` from the
    latest right row at-or-before (``backward``) / earliest at-or-after
    (``forward``) its timestamp, per ``on`` key. Unmatched left rows keep
    nulls (left-outer semantics, row count preserved).

    Ties between multiple right rows at the same (key, ts) are not
    ordered — pre-aggregate the right side to one row per (key, ts) for
    fully deterministic output (as pandas ``merge_asof`` requires sorted
    unique keys).

    Carried columns keep their right-side name unless it collides with a
    left column, in which case ``suffix`` is appended.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_types = dict(left.dtypes)
    right_types = dict(right.dtypes)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = [c for c in left.columns if c not in keys]

    l_tagged = left.select(
        *[F.col(c) for c in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in payload],
        *[F.lit(None).cast(right_types[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in payload],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )

    ts_ord = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    # at equal _ts: right(0) before left(1) includes the exact match in
    # the left row's frame; reversed excludes it
    side_ord = F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, side_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def out_name(c: str) -> str:
        return c + suffix if c in left.columns else c

    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(out_name(c))
        for c in value_cols
    ]
    return (
        l_tagged.unionByName(r_tagged)
        .select(*keys, *payload, F.col("_side"), *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    conditions: Column | Sequence[Column],
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Join on arbitrary (non-equi) range predicates against a SMALL right
    side (band/bucket tables, calendars). The broadcast hint pins a
    BroadcastNestedLoopJoin: each task probes its partition of the big
    side against the in-memory right table — no shuffle of the big side.
    For two large sides use :func:`interval_join_bucketed`.
    """
    cond = conditions if isinstance(conditions, Column) else F.lit(True)
    if not isinstance(conditions, Column):
        for c in conditions:
            cond = cond & c
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, cond, how)


def interval_join_bucketed(
    left: DataFrame,
    left_point: str,
    right: DataFrame,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-[lo,hi) interval join for two LARGE sides.

    Quantize the point and each interval endpoint to grid cells
    (intervals explode to every cell they overlap), equi-join on the
    cell, then post-filter exact containment. Each (point, interval)
    match lands in exactly one cell — the point's — so no dedup is
    needed. Choose ``bucket_width`` near the typical interval width so
    fan-out stays O(1).
    """
    if how != "inner":
        raise ValueError("interval_join_bucketed supports inner joins only")
    lb = left.withColumn("_cell", (F.col(left_point) / bucket_width).cast("long"))
    rb = right.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                (F.col(right_lo) / bucket_width).cast("long"),
                (F.col(right_hi) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, on="_cell", how="inner")
        .filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) < F.col(right_hi))
        )
        .drop("_cell")
    )
