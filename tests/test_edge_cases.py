"""Edge-input battery: empty pipelines, all-null columns, single rows.
The short-doc shingle crash showed these paths can hide ANSI-mode bombs;
every operator here must degrade gracefully, never throw."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gratum_spark import RejectionCategory, sources


@pytest.fixture()
def empty(spark):
    return sources.from_collection(
        spark, [], name="empty", schema="id long, name string, v double"
    )


@pytest.fixture()
def nullish(spark):
    rows = [
        {"id": 1, "name": None, "v": None},
        {"id": 2, "name": "", "v": 0.0},
        {"id": None, "name": "x", "v": 1.5},
    ]
    return sources.from_collection(spark, rows, name="nullish")


def test_empty_pipeline_core_ops(empty):
    p = (
        empty.filter({"name": "a"})
        .trim()
        .unique("id")
        .limit(5, halt=False)
        .add_field("w", F.col("v") * 2)
        .default_values({"name": "?"})
        .sort("id")
    )
    stat = p.go()
    assert stat.loaded == 0 and stat.rejected == 0


def test_empty_add_step_and_group(empty):
    with pytest.warns(UserWarning, match="schema inference fell back"):
        p = empty.add_step(lambda r: r).group_by("name").agg(n=F.count("*"))
    assert p.df.collect() == []
    with pytest.warns(UserWarning, match="schema inference fell back"):
        assert empty.add_step(lambda r: {**r, "extra": 1}).columns == ["id", "name", "v"]
    # empty source -> schema inference falls back to input schema; explicit schema still works
    p2 = empty.add_step(lambda r: {"id": r["id"], "extra": 1}, schema="id long, extra long")
    assert p2.columns == ["id", "extra"]


def test_empty_joins_and_concat(empty, spark):
    other = sources.from_collection(spark, [{"id": 1, "tag": "t"}], name="o")
    assert empty.join(other, on="id").df.count() == 0
    assert other.join(empty, on="id", left=True).df.count() == 1
    assert empty.concat(other).df.count() == 1
    assert empty.intersect(other, on="id").df.count() == 0


def test_nullish_coercions_and_fill(nullish):
    p = nullish.as_double("v").as_int("id")
    stat = p.go()
    assert stat.loaded == 3  # nulls pass through coercion untouched
    f = nullish.fill_down_by(["name"], order_by="id")
    assert f.df.count() == 3


def test_null_key_join_and_unique(nullish, spark):
    other = sources.from_collection(spark, [{"id": 1, "tag": "t"}], name="o2")
    j = nullish.join(other, on="id")
    # null-key row can't match -> rejected, not crashed
    stat = j.go()
    assert stat.loaded == 1
    assert stat.rejections_for(RejectionCategory.IGNORE_ROW) == 2
    u = nullish.unique("name")
    assert u.df.count() == 3  # None, "", "x" all distinct


def test_empty_dedup_and_text_ops(empty, spark):
    from gratum_spark.operators import dedup, text

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.exact_dedup(docs, ["text"], "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(docs, "doc_id", "text").count() == 0
    assert dedup.minhash_lsh_pairs(docs, "doc_id", "text").count() == 0
    assert dedup.simhash_pairs(docs, "doc_id", "text").count() == 0
    assert text.ngram_overlap(docs, docs).count() == 0


def test_null_text_rows_in_dedup(spark):
    from gratum_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, None), (2, "one two three four five"), (3, "one two three four five")],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text").collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(2, 3)]
    mh = dedup.minhash_lsh_pairs(docs, "doc_id", "text", shingle_k=3).collect()
    assert [(r["a"], r["b"]) for r in mh] == [(2, 3)]


def test_empty_embeddings_ops(spark):
    from gratum_spark.operators import similarity

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.cosine_topk(emb, [1.0, 0.0], k=5).count() == 0
