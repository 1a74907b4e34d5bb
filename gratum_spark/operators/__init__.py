"""Beyond-reference operators: dedup, similarity search, text analysis,
retrieval, time series, multimodal plumbing, windowed analytics. See
each module's docstring for the 100 TB scale design."""

from . import (
    dedup,
    graph,
    http,
    inference,
    joins,
    multimodal,
    packing,
    pgp,
    retrieval,
    sampling,
    similarity,
    text,
    timeseries,
)

__all__ = [
    "dedup",
    "graph",
    "similarity",
    "text",
    "retrieval",
    "timeseries",
    "multimodal",
    "packing",
    "inference",
    "pgp",
    "http",
    "joins",
    "sampling",
]
