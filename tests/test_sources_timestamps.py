"""Timestamp-encoding matrix for the parquet source and event stream
(r4 regression area: the driver's events table switched TIMESTAMP(NANOS)
-> TIMESTAMP(MICROS, isAdjustedToUTC=false) between rounds).

Contract under test: whatever the parquet writer chose — micros UTC,
micros NTZ, or legacy nanos — both `sources.parquet` and
`streaming.read_event_stream` surface ONE uniform TimestampType with
identical wall-clock values, and reads never permanently mutate a
caller session's confs.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gratum_spark.sources import _normalize_ntz, _scoped_conf, parquet
from gratum_spark.streaming import read_event_stream, run_available_now

WALL = [
    datetime.datetime(2024, 1, 1, 12, 0, 0),
    datetime.datetime(2024, 6, 2, 3, 4, 5, 250000),
]

ENCODINGS = {
    "micros_utc": pa.timestamp("us", tz="UTC"),
    "micros_ntz": pa.timestamp("us"),
    "nanos": pa.timestamp("ns"),
}


@pytest.fixture(scope="module", params=sorted(ENCODINGS))
def ts_file(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"ts_{request.param}")
    t = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(WALL, type=ENCODINGS[request.param]),
        }
    )
    path = str(d / "part-0.parquet")
    pq.write_table(t, path)
    return request.param, path


def test_batch_uniform_timestamp_type_and_values(spark, ts_file):
    enc, path = ts_file
    df = parquet(spark, path).df
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint", "timestamp"]
    got = [r["ts"] for r in df.orderBy("id").collect()]
    assert got == WALL, f"{enc}: wall-clock drifted: {got}"


def test_batch_read_does_not_mutate_caller_conf(spark, ts_file):
    """A foreign session that prefers NTZ inference keeps its setting —
    the scan-typing conf is scoped to the read (ADVICE r4)."""
    _, path = ts_file
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "true")
        df = parquet(spark, path).df
        assert spark.conf.get(key) == "true"
        # and execution AFTER the conf was restored still yields the
        # scan-typed values (the plan schema is fixed at inference)
        assert [r["ts"] for r in df.orderBy("id").collect()] == WALL
    finally:
        spark.conf.set(key, old)


def test_stream_matches_batch_types_and_values(spark, ts_file):
    enc, path = ts_file
    sdf = read_event_stream(spark, path)
    assert [f.dataType.simpleString() for f in sdf.schema.fields] == ["bigint", "timestamp"]
    out = run_available_now(sdf, f"ts_matrix_{enc}", output_mode="append")
    assert sorted(r["ts"] for r in out.collect()) == WALL


def test_stream_normalizes_second_ntz_column(spark, tmp_path):
    """ADVICE r4 (medium): a SECOND NTZ column beyond ts_col must also be
    re-tagged in the stream plan, keeping batch/stream type parity."""
    d = tmp_path / "two_ntz"
    d.mkdir()
    t = pa.table(
        {
            "id": pa.array([1], type=pa.int64()),
            "ts": pa.array([WALL[0]], type=pa.timestamp("us")),
            "seen_at": pa.array([WALL[1]], type=pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"))
    batch = parquet(spark, str(d)).df
    # force the fallback path: hand the stream an NTZ schema as a locked
    # conf would produce it, so normalization (not inference) must fix it
    with _scoped_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "true"):
        ntz_schema = spark.read.parquet(str(d)).schema
    assert "timestamp_ntz" in ntz_schema.simpleString()
    sdf = read_event_stream(spark, str(d), schema=ntz_schema)
    assert [f.dataType.simpleString() for f in sdf.schema.fields] == [
        f.dataType.simpleString() for f in batch.schema.fields
    ]
    assert all(f.dataType.simpleString() == "timestamp" for f in sdf.schema.fields if f.name != "id")


def test_nanos_detected_under_partitioned_layout(spark, tmp_path):
    """Legacy nanos parquet written with partitionBy (key=value subdirs)
    must still be detected and converted — the footer sniff walks to the
    first data file."""
    d = tmp_path / "nanos_part" / "pt=1"
    d.mkdir(parents=True)
    t = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(WALL, type=pa.timestamp("ns")),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"))
    df = parquet(spark, str(tmp_path / "nanos_part")).df
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert sorted(r["ts"] for r in df.collect()) == WALL


def test_normalize_ntz_recurses_into_nested_types(spark, tmp_path):
    """ADVICE r4 (low): NTZ nested inside struct/array must not leak
    through normalization."""
    d = tmp_path / "nested_ntz"
    d.mkdir()
    t = pa.table(
        {
            "id": pa.array([7], type=pa.int64()),
            "meta": pa.array(
                [{"created": WALL[0]}],
                type=pa.struct([("created", pa.timestamp("us"))]),
            ),
            "edits": pa.array([[WALL[1]]], type=pa.list_(pa.timestamp("us"))),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"))
    with _scoped_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "true"):
        raw = spark.read.parquet(str(d))
    assert "timestamp_ntz" in raw.schema.simpleString()
    fixed = _normalize_ntz(raw)
    assert "timestamp_ntz" not in fixed.schema.simpleString()
    row = fixed.collect()[0]
    assert row["meta"]["created"] == WALL[0]
    assert row["edits"][0] == WALL[1]


# ---------------------------------------------------------------------------
# parquet metadata memo (r15 optimization): schema inference is cached per
# (path, file fingerprint); rows are never cached, and rewriting the path
# invalidates the entry immediately.
# ---------------------------------------------------------------------------


def test_parquet_schema_memo_hits_and_matches_inference(spark, tmp_path):
    import gratum_spark.sources as sources

    p = str(tmp_path / "memo.parquet")
    spark.range(5).selectExpr("id", "id * 2 AS v").write.parquet(p)
    sources._PARQUET_META_MEMO.clear()
    first = sources.parquet(spark, p).df
    key = (p, sources._parquet_fingerprint(p))
    assert key in sources._PARQUET_META_MEMO  # populated by the cold read
    second = sources.parquet(spark, p).df  # memo hit (same fingerprint)
    assert second.schema == first.schema
    assert sorted(r["v"] for r in second.collect()) == [0, 2, 4, 6, 8]


def test_parquet_schema_memo_invalidated_by_rewrite(spark, tmp_path):
    import gratum_spark.sources as sources

    p = str(tmp_path / "rewrite.parquet")
    spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s").write.parquet(p)
    assert sources.parquet(spark, p).df.schema["s"].dataType.typeName() == "string"
    # same path, different schema AND different rows: the fingerprint
    # (size + mtime_ns of every data file) must miss the stale entry
    spark.range(4).selectExpr("id", "CAST(id AS DOUBLE) AS s").write.mode(
        "overwrite"
    ).parquet(p)
    reread = sources.parquet(spark, p).df
    assert reread.schema["s"].dataType.typeName() == "double"
    assert reread.count() == 4


def test_parquet_schema_memo_skips_remote_paths(spark):
    import gratum_spark.sources as sources

    assert sources._parquet_fingerprint("s3://bucket/data.parquet") is None
