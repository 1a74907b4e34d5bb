"""Time-series gap-fill and interpolation over event streams.

Beyond-reference capability: the hypertable resampling shape
(TimescaleDB's time_bucket_gapfill + interpolate, InfluxDB's fill())
— re-express an irregular per-key event series on a fixed time grid,
linearly interpolating between the surrounding observations.

Scale design: ONE shuffle. The grid is generated per key from the
key's own [min, max] span (sequence + explode — map-side), unioned
with the events; both window passes (previous / next observation)
share one (key) exchange. The forward-looking pass runs on a SECOND,
descending in-partition sort rather than an unbounded-following frame
on the ascending one: Spark's shrinking-frame processor
(UnboundedFollowingWindowFunctionFrame) re-evaluates the aggregate
from the current row to the partition end for EVERY row — O(n²) per
key — while an unbounded-preceding frame is maintained incrementally.
Measured at sf0.1 (min of 5): 1.87 s -> 0.64 s, rows bit-identical
(r15; the extra sort is in-partition only, no second exchange). No
UDF, no driver-side work; per-key state is bounded by span/step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_interpolate"]


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Resample each key's series onto a fixed grid anchored at the
    key's first observation, linear-interpolating ``val_col`` between
    the surrounding events.

    Semantics (engine-replicable, pinned by the oracle):
    - grid points run from min(ts) to max(ts) per key, inclusive, in
      ``step`` increments — no extrapolation beyond the series;
    - a grid point lands exactly on an observation -> that value;
    - otherwise v = v_prev + (v_next - v_prev) · (t - t_prev)/(t_next
      - t_prev), time deltas in exact integer microseconds;
    - a grid point after the last observation (only the anchor-aligned
      tail can produce one) forward-fills the last value.

    Returns (key, grid_ts, value).
    """
    bounds = df.groupBy(F.col(key_col).alias("__k__")).agg(
        F.min(ts_col).alias("__t0__"), F.max(ts_col).alias("__t1__")
    )
    grid = bounds.select(
        "__k__",
        F.explode(
            F.sequence("__t0__", "__t1__", F.expr(f"interval {step}"))
        ).alias("__ts__"),
    ).select(
        "__k__",
        "__ts__",
        F.lit(1).alias("__is_grid__"),
        F.lit(None).cast("double").alias("__v__"),
    )
    ev = df.select(
        F.col(key_col).alias("__k__"),
        F.col(ts_col).alias("__ts__"),
        F.lit(0).alias("__is_grid__"),
        F.col(val_col).cast("double").alias("__v__"),
    )
    u = ev.unionByName(grid)
    # an event sharing a grid point's timestamp sorts BEFORE it
    # (is_grid tie-break), so the backward pass sees it and frac lands
    # on exactly 0; the forward pass excludes it either way, and
    # (key, ts) pairs need not be unique across is_grid because the
    # tie-break totals the order within a key
    w = Window.partitionBy("__k__").orderBy("__ts__", "__is_grid__")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    # forward pass: same semantics as first(...) over [0, unbounded
    # FOLLOWING] on the ascending sort, but expressed as last(...) over
    # the REVERSED sort's growing frame — incremental O(n) instead of
    # the shrinking frame's per-row re-evaluation (module docstring)
    wd = Window.partitionBy("__k__").orderBy(
        F.col("__ts__").desc(), F.col("__is_grid__").desc()
    )
    wdb = wd.rowsBetween(Window.unboundedPreceding, 0)
    ev_ts = F.when(F.col("__is_grid__") == 0, F.col("__ts__"))
    prev_v = F.last("__v__", ignorenulls=True).over(wb)
    prev_t = F.last(ev_ts, ignorenulls=True).over(wb)
    next_v = F.last("__v__", ignorenulls=True).over(wdb)
    next_t = F.last(ev_ts, ignorenulls=True).over(wdb)
    t = F.unix_micros(F.col("__ts__"))
    tp = F.unix_micros(prev_t)
    tn = F.unix_micros(next_t)
    interp = F.when(next_v.isNull() | (tn == tp), prev_v).otherwise(
        prev_v
        + (next_v - prev_v)
        * ((t - tp).cast("double") / (tn - tp).cast("double"))
    )
    return (
        u.withColumn("__out__", interp)
        .filter(F.col("__is_grid__") == 1)
        .select(
            F.col("__k__").alias(key_col),
            F.col("__ts__").alias("grid_ts"),
            F.col("__out__").alias("value"),
        )
    )
