"""Time-series gap-fill and interpolation over event streams.

Beyond-reference capability: the hypertable resampling shape
(TimescaleDB's time_bucket_gapfill + interpolate, InfluxDB's fill())
— re-express an irregular per-key event series on a fixed time grid,
linearly interpolating between the surrounding observations.

Scale design: ONE shuffle. The grid is generated per key from the
key's own [min, max] span (sequence + explode — map-side), unioned
with the events, and both window passes (previous / next observation)
share a single (key, ts) partitioning and ordering — the
forward-looking pass uses an unbounded-following frame on the SAME
ascending sort instead of a second descending sort. No UDF, no
driver-side work; per-key state is bounded by that key's span/step.
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
    # one ascending sort serves both directions; an event sharing a
    # grid point's timestamp sorts BEFORE it (is_grid tie-break), so
    # the backward pass sees it and frac lands on exactly 0
    w = Window.partitionBy("__k__").orderBy("__ts__", "__is_grid__")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(0, Window.unboundedFollowing)
    ev_ts = F.when(F.col("__is_grid__") == 0, F.col("__ts__"))
    prev_v = F.last("__v__", ignorenulls=True).over(wb)
    prev_t = F.last(ev_ts, ignorenulls=True).over(wb)
    next_v = F.first("__v__", ignorenulls=True).over(wf)
    next_t = F.first(ev_ts, ignorenulls=True).over(wf)
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
