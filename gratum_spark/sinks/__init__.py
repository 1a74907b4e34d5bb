"""Sinks: reference writers re-expressed as Spark writers.

Reference inventory (src/main/groovy/gratum/sink/): CsvSink, JsonSink,
JsonLines (Pipeline.jsonl), XlsxSink, plus the Sink SPI. Distributed
writes (csv/json/parquet) live on Pipeline (.save/.json/.jsonl/
.parquet); this module adds the single-file / driver-side compat forms.
"""

from __future__ import annotations

import abc
import json as _json
from collections.abc import Iterable

from pyspark.sql import DataFrame

__all__ = [
    "Sink",
    "CsvSink",
    "JsonSink",
    "XlsxSink",
    "write_json_array",
    "write_xlsx",
    "write_single_csv",
    "write_bucketed",
]


class Sink(abc.ABC):
    """Pluggable sink SPI (reference: sink/Sink.groovy:5-13).

    ``Pipeline.save(sink)`` calls ``attach(pipeline)`` to consume the
    rows (a distributed ``df.write`` or a bounded ``toLocalIterator``
    stream — the sink chooses), then ``close()``, then wraps
    ``result()`` — a one-row dict payload — as the returned pipeline
    (reference: Pipeline.groovy:833-844).
    """

    @property
    def name(self) -> str:
        return type(self).__name__

    @abc.abstractmethod
    def attach(self, pipeline) -> None:
        """Consume the pipeline's rows."""

    def close(self) -> None:
        """Finalize the output (flush/close handles). Default: no-op."""

    @abc.abstractmethod
    def result(self) -> dict:
        """One-row payload describing what was written."""


class _FileSink(Sink):
    def __init__(self, path: str) -> None:
        self.path = path
        self._rows = 0

    @property
    def name(self) -> str:
        return self.path.rsplit("/", 1)[-1]

    def result(self) -> dict:
        # mirrors reference getResult [file, filename] (CsvSink.groovy:41-43);
        # no stream handle — reopen by path
        return {"file": self.name, "filename": self.path}


class CsvSink(_FileSink):
    """Single-file always-quoted CSV (reference: sink/CsvSink.groovy:9-49)."""

    def __init__(self, path: str, separator: str = ",", columns: Iterable[str] | None = None):
        super().__init__(path)
        self.separator = separator
        self.columns = list(columns) if columns else None

    def attach(self, pipeline) -> None:
        write_single_csv(pipeline._clean_df(self.columns), self.path, self.separator)


class JsonSink(_FileSink):
    """Single-file JSON array / JSONL (reference: sink/JsonSink.groovy:9-83,
    ``jsonObjectPerLine`` flag)."""

    def __init__(
        self,
        path: str,
        columns: Iterable[str] | None = None,
        json_object_per_line: bool = False,
    ):
        super().__init__(path)
        self.columns = list(columns) if columns else None
        self.json_object_per_line = json_object_per_line

    def attach(self, pipeline) -> None:
        df = pipeline._clean_df(self.columns)
        if self.json_object_per_line:
            with open(self.path, "w", encoding="utf-8") as f:
                for row in df.toLocalIterator():
                    f.write(_json.dumps(row.asDict(recursive=True), default=str))
                    f.write("\n")
        else:
            write_json_array(df, self.path)


class XlsxSink(_FileSink):
    """XLSX sink (reference: sink/XlsxSink.groovy:16-81); gated on openpyxl."""

    def __init__(self, path: str, sheet: str = "Sheet1"):
        super().__init__(path)
        self.sheet = sheet

    def attach(self, pipeline) -> None:
        write_xlsx(pipeline._clean_df(), self.path, self.sheet)


def write_json_array(df: DataFrame, path: str, columns: Iterable[str] | None = None) -> str:
    """Single-file JSON array (reference: sink/JsonSink.groovy:9-83).

    Collects through toLocalIterator — bounded driver memory, but a
    single output file is inherently non-parallel; prefer
    Pipeline.jsonl() at scale.
    """
    if columns:
        df = df.select(*columns)
    with open(path, "w", encoding="utf-8") as f:
        f.write("[\n")
        first = True
        for row in df.toLocalIterator():
            if not first:
                f.write(",\n")
            f.write(_json.dumps(row.asDict(recursive=True), default=str))
            first = False
        f.write("\n]")
    return path


def write_single_csv(
    df: DataFrame,
    path: str,
    separator: str = ",",
    columns: Iterable[str] | None = None,
) -> str:
    """Single-file always-quoted CSV (reference: csv/CSVFile.java:229-254 —
    quoted fields, doubled-quote escape, newline kept inside quotes).
    Driver-side streaming write via toLocalIterator."""
    import csv as _csv

    if columns:
        df = df.select(*columns)
    with open(path, "w", newline="", encoding="utf-8") as f:
        writer = _csv.writer(f, delimiter=separator, quoting=_csv.QUOTE_ALL)
        writer.writerow(df.columns)
        for row in df.toLocalIterator():
            writer.writerow(["" if v is None else v for v in row])
    return path


def write_xlsx(df: DataFrame, path: str, sheet: str = "Sheet1") -> str:
    """XLSX sink (reference: sink/XlsxSink.groovy:16-81 — streaming SXSSF).

    pandas/openpyxl on the driver; spreadsheets are small-output by
    nature. Gated behind import-try (openpyxl isn't baked in here).
    """
    try:
        pdf = df.toPandas()
        pdf.to_excel(path, sheet_name=sheet, index=False)
    except ImportError as e:  # pragma: no cover - environment-gated
        raise NotImplementedError("xlsx sink requires openpyxl") from e
    return path


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed managed table (beyond-reference, 100 TB feature): rows
    are hash-partitioned into ``n_buckets`` files per partition keyed on
    ``bucket_cols`` AT WRITE TIME, so every later equi-join or groupBy
    on those keys skips its shuffle entirely — the single biggest
    repeated-cost saving for fact tables that are joined daily.

    Optionally sorted within buckets (sort-merge join without the sort).
    Bucketing requires saveAsTable (metastore records the bucket spec);
    ``path`` pins the table location for unmanaged data.
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").mode("overwrite").saveAsTable(table)
