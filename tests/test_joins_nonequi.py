"""asof_join / range_join / interval_join_bucketed semantics
(operators.joins — beyond-reference non-equi join shapes)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gratum_spark.operators import joins


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _quotes(spark):
    # per-key quote stream: key, ts, px
    return spark.createDataFrame(
        [
            ("a", _t("2024-01-01T00:00:00"), 1.0),
            ("a", _t("2024-01-01T00:05:00"), 2.0),
            ("a", _t("2024-01-01T00:10:00"), 3.0),
            ("b", _t("2024-01-01T00:07:00"), 9.0),
        ],
        "key string, ts timestamp, px double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [
            (1, "a", _t("2024-01-01T00:04:00")),   # between quotes 1 and 2
            (2, "a", _t("2024-01-01T00:05:00")),   # exactly on quote 2
            (3, "a", _t("2023-12-31T23:00:00")),   # before any quote
            (4, "b", _t("2024-01-01T00:08:00")),   # after b's only quote
            (5, "c", _t("2024-01-01T00:08:00")),   # key with no quotes
        ],
        "trade_id long, key string, ts timestamp",
    )


def test_asof_backward(spark):
    out = joins.asof_join(
        _trades(spark), _quotes(spark), on="key", value_cols=["px"]
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: 9.0, 5: None}
    assert out.count() == 5  # left-outer: row count preserved


def test_asof_backward_strict(spark):
    out = joins.asof_join(
        _trades(spark), _quotes(spark), on="key", value_cols=["px"],
        allow_exact_matches=False,
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got[2] == 1.0  # exact-ts quote excluded, falls back to prior


def test_asof_forward(spark):
    out = joins.asof_join(
        _trades(spark), _quotes(spark), on="key", value_cols=["px"],
        direction="forward",
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got == {1: 2.0, 2: 2.0, 3: 1.0, 4: None, 5: None}


def test_asof_collision_suffix(spark):
    # carried column name colliding with a left column gets the suffix
    right = _quotes(spark).withColumnRenamed("px", "ts2").withColumnRenamed("ts", "qts")
    left = _trades(spark).withColumn("ts2", F.lit(0.0))
    out = joins.asof_join(
        left, right, on="key", left_ts="ts", right_ts="qts", value_cols=["ts2"]
    )
    assert "ts2_asof" in out.columns and "ts2" in out.columns


def test_range_join_banding(spark):
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, x double"
    )
    bands = spark.createDataFrame(
        [("lo", 0, 10), ("hi", 10, 100)], "band string, lo int, hi int"
    )
    out = joins.range_join(
        pts, bands, [F.col("x") >= F.col("lo"), F.col("x") < F.col("hi")]
    )
    counts = {r["band"]: r["n"] for r in out.groupBy("band").agg(F.count("*").alias("n")).collect()}
    assert counts == {"lo": 10, "hi": 10}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_interval_join_bucketed_matches_range_join(spark):
    pts = spark.createDataFrame(
        [(i, float(i % 37)) for i in range(200)], "id long, x double"
    )
    ivs = spark.createDataFrame(
        [(j, float(j * 3), float(j * 3 + 5)) for j in range(12)],
        "iv long, lo double, hi double",
    )
    cond = [F.col("x") >= F.col("lo"), F.col("x") < F.col("hi")]
    expect = sorted(
        (r["id"], r["iv"]) for r in joins.range_join(pts, ivs, cond).collect()
    )
    got = sorted(
        (r["id"], r["iv"])
        for r in joins.interval_join_bucketed(pts, "x", ivs, "lo", "hi", 4.0).collect()
    )
    assert got == expect and len(got) > 0


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], "k long, v long"
    )
    right = spark.createDataFrame(
        [(0, "a"), (1, "b"), (4, "d")], "k long, tag string"
    )
    plain = sorted((r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect())
    salted = sorted(
        (r["k"], r["v"], r["tag"])
        for r in joins.salted_join(left, right, "k", n_salts=4).collect()
    )
    assert salted == plain and len(salted) == 67
