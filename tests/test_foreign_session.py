"""The driver's correctness harness passes its OWN SparkSession into
queries() — one that has NOT set spark.sql.legacy.parquet.nanosAsLong.
Round-1 lost 13 queries to exactly that (events.parquet ts is parquet
TIMESTAMP(NANOS)). These tests simulate a foreign session by unsetting
the conf before the read, and assert the read sites set it defensively."""
from __future__ import annotations

import pytest

from gratum_spark import sources, streaming

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def foreign_conf(spark):
    """Temporarily strip the nanos conf, as a driver-made session would be."""
    spark.conf.unset(NANOS_CONF)
    yield spark
    spark.conf.set(NANOS_CONF, "true")


def test_events_table_reads_without_session_conf(foreign_conf, sf_dir):
    p = sources.table(foreign_conf, sf_dir, "events")
    row = p.df.select("ts").first()
    assert row is not None
    assert p.df.schema["ts"].dataType.simpleString() == "timestamp"


def test_event_stream_schema_without_session_conf(foreign_conf, sf_dir):
    sdf = streaming.read_event_stream(foreign_conf, f"{sf_dir}/events.parquet")
    assert sdf.isStreaming
    assert sdf.schema["ts"].dataType.simpleString() == "timestamp"
