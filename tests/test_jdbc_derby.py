"""JDBC source round-trip against embedded Derby (bundled with Spark) —
covers the plain and partitioned read paths (reference:
JdbcSource.groovy:22-66)."""
from __future__ import annotations

import pytest

from gratum_spark import sources

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    src = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id int, name string, score double",
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "people")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_read_roundtrip(spark, derby_url):
    p = sources.jdbc(
        spark, derby_url, "SELECT * FROM people", properties={"driver": DRIVER}
    )
    rows = p.df.collect()
    assert len(rows) == 100
    by_id = {r["id"]: r for r in rows}
    assert by_id[7]["name"] == "name_7" and by_id[7]["score"] == 10.5


def test_jdbc_partitioned_read(spark, derby_url):
    p = sources.jdbc(
        spark,
        derby_url,
        "SELECT * FROM people",
        properties={"driver": DRIVER},
        partition_column='"id"',
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert p.df.rdd.getNumPartitions() == 4
    assert p.df.count() == 100
    # every row appears exactly once across range partitions
    assert p.df.select("id").distinct().count() == 100


def test_jdbc_pushdown_filter(spark, derby_url):
    p = sources.jdbc(
        spark, derby_url, "SELECT * FROM people", properties={"driver": DRIVER}
    ).filter("id < 10")
    assert p.df.count() == 10


def test_jdbc_sink_write_and_readback(spark, derby_url, tmp_path):
    # beyond-reference JDBC SINK: write a pipeline to Derby, read it
    # back through the JDBC source, counts and values round-trip
    rows = [{"id": i, "label": f"r{i}"} for i in range(40)]
    p = sources.from_collection(spark, rows, "id int, label string", ordered=False)
    result = p.jdbc(derby_url, "sink_out", properties={"driver": DRIVER})
    assert result.go().loaded == 40
    back = sources.jdbc(spark, derby_url, "sink_out", properties={"driver": DRIVER})
    got = {r["id"]: r["label"] for r in back.df.collect()}
    assert got == {i: f"r{i}" for i in range(40)}
