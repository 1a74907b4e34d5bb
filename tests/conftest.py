from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from gratum_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("gratum-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def plan_of(df) -> str:
    """Formatted physical-plan string of a DataFrame — the PRE-execution
    (initial) plan; with AQE on it carries the `AdaptiveSparkPlan
    isFinalPlan=false` header, so shape assertions read the static plan,
    not a re-optimized runtime one. Centralized here (r15 ADVICE) so a
    Spark upgrade that moves the private bridge needs one fix, not five:
    every plan-shape test should import this instead of reaching for
    `_sc._jvm.PythonSQLUtils` itself."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


PEOPLE = [
    {"id": 1, "name": "Bill Rhodes", "age": 53, "gender": "male", "comment": "solid\nguy"},
    {"id": 2, "name": "Cheryl Lipscome", "age": 25, "gender": "female", "comment": "ok"},
    {"id": 3, "name": "Diana Rogers", "age": 34, "gender": "female", "comment": "fine"},
    {"id": 4, "name": "Jack Lowland", "age": 83, "gender": "male", "comment": "old\ntimer"},
    {"id": 5, "name": "Ginger Rogers", "age": 83, "gender": "female", "comment": "dancer"},
]

HOBBIES = [
    {"id": 1, "hobby": "Stamp Collecting"},
    {"id": 1, "hobby": "Bird Watching"},
    {"id": 2, "hobby": "Biking"},
    {"id": 2, "hobby": "Tennis"},
    {"id": 3, "hobby": "Archeology"},
    {"id": 3, "hobby": "Treasure Hunting"},
    {"id": 4, "hobby": "Crossfit"},
    {"id": 4, "hobby": "Painting"},
]


@pytest.fixture()
def people(spark):
    from gratum_spark import sources

    return sources.from_collection(spark, PEOPLE, name="people")


@pytest.fixture()
def hobbies(spark):
    from gratum_spark import sources

    return sources.from_collection(spark, HOBBIES, name="hobbies")
