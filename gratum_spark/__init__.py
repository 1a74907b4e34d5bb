"""gratum_spark: a PySpark-native analytics/ETL engine with the
capabilities of chubbard/gratum, re-architected DataFrame-first.

Quick start::

    from gratum_spark import sources, get_spark
    spark = get_spark()
    stat = (
        sources.csv(spark, "titanic.csv")
        .filter({"Sex": "male"})
        .go()
    )
    assert stat.loaded == 266 and stat.rejected == 152
"""

from .pipeline import Pipeline, GroupedPipeline, ROW_ORDER
from .rejections import LoadStatistic, Rejection, RejectionCategory, reject
from .session import get_spark
from .concurrency import LocalConcurrentContext
from . import operators, sinks, sources, streaming

__all__ = [
    "Pipeline",
    "GroupedPipeline",
    "LoadStatistic",
    "Rejection",
    "reject",
    "RejectionCategory",
    "LocalConcurrentContext",
    "get_spark",
    "operators",
    "sources",
    "sinks",
    "streaming",
    "ROW_ORDER",
]

__version__ = "0.1.0"
