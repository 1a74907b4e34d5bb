"""Sink SPI (reference: sink/Sink.groovy:5-13, Pipeline.groovy:833-844;
test model: sink/JsonSinkTest.groovy)."""
from __future__ import annotations

import json

import pytest

from gratum_spark import sources
from gratum_spark.sinks import CsvSink, JsonSink, Sink

BANDS = [
    {"firstName": "Bob", "lastName": "Dylan", "band": None},
    {"firstName": "Mick", "lastName": "Jagger", "band": "Rolling Stones"},
    {"firstName": "Keith", "lastName": "Richards", "band": "Rolling Stones"},
    {"firstName": "David", "lastName": "Gahan", "band": "Depeche Mode"},
    {"firstName": "Martin", "lastName": "Gore", "band": "Depeche Mode"},
]


class CollectingSink(Sink):
    """Custom in-memory sink — proves the SPI is user-extensible."""

    def __init__(self):
        self.rows = []
        self.closed = False

    def attach(self, pipeline):
        self.rows = [r.asDict() for r in pipeline._clean_df().toLocalIterator()]

    def close(self):
        self.closed = True

    def result(self):
        return {"count": len(self.rows)}


def test_custom_sink_attach_close_result(spark):
    sink = CollectingSink()
    p = sources.from_collection(spark, BANDS, name="bands").save(sink)
    assert sink.closed
    assert len(sink.rows) == 5
    assert {r["firstName"] for r in sink.rows} == {"Bob", "Mick", "Keith", "David", "Martin"}
    # save() returns the sink's result() as a 1-row pipeline
    row = p.df.collect()
    assert len(row) == 1 and row[0]["count"] == 5


def test_json_sink_array_file(spark, tmp_path):
    out = str(tmp_path / "bands.json")
    p = sources.from_collection(spark, BANDS, name="bands").save(JsonSink(out))
    data = json.load(open(out))
    assert len(data) == 5
    assert {d["lastName"] for d in data} == {"Dylan", "Jagger", "Richards", "Gahan", "Gore"}
    assert p.df.collect()[0]["filename"] == out


def test_json_sink_object_per_line(spark, tmp_path):
    out = str(tmp_path / "bands.jsonl")
    sources.from_collection(spark, BANDS, name="bands").save(
        JsonSink(out, columns=["firstName"], json_object_per_line=True)
    )
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 5 and set(lines[0]) == {"firstName"}


def test_csv_sink_quoted(spark, tmp_path):
    out = str(tmp_path / "bands.csv")
    sources.from_collection(spark, BANDS, name="bands").save(
        CsvSink(out, columns=["firstName", "lastName"])
    )
    text = open(out).read().splitlines()
    assert text[0] == '"firstName","lastName"'
    assert len(text) == 6


def test_xlsx_sink_gated_when_openpyxl_missing(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401
        pytest.skip("openpyxl installed; gate not applicable")
    except ImportError:
        pass
    from gratum_spark.sinks import XlsxSink

    with pytest.raises(NotImplementedError, match="openpyxl"):
        sources.from_collection(spark, BANDS, name="bands").save(
            XlsxSink(str(tmp_path / "b.xlsx"))
        )


def test_save_result_pipeline_reports_parent_loaded(spark, tmp_path):
    # reference PipelineTest.testSave: go() after save() counts the SAVED
    # rows, not the 1-row result (result rows are DO_NOT_TRACK)
    p = sources.from_collection(spark, BANDS, name="bands").save(
        str(tmp_path / "out_csv")
    )
    assert len(p.df.collect()) == 1  # downstream sees the result row
    stat = p.go()
    assert stat.loaded == 5
    s2 = sources.from_collection(spark, BANDS, name="bands").save(CollectingSink()).go()
    assert s2.loaded == 5
