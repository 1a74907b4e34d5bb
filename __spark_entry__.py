"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query (q1 pricing summary) at sf0.001.
queries()       -> every implemented operator from SURVEY.md §2 plus the
                   training-data-pipeline operators, each as
                   (spark, sf_dir) -> DataFrame built through the
                   gratum_spark engine API.
oracle_sql()    -> DuckDB-equivalent SQL per query (omitted only for
                   hash-specific ops: minhash/simhash/LSH/IVF/HLL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from gratum_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    pipeline_curation is the engine in one plan: quality filter →
    exact dedup → deterministic train/test split → summary."""
    fn, _ = QUERIES["pipeline_curation"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
