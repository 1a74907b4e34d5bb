"""Streaming tests: the same window-aggregation builders must produce
identical results in batch mode and under readStream + availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gratum_spark import sources, streaming


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return sources.table(spark, sf_dir, "events").df


def _normalize(df, keys):
    return sorted(tuple(r) for r in df.select(*keys).collect())


def test_tumbling_stream_equals_batch(spark, events_path, events_batch):
    batch = streaming.tumbling_agg(events_batch, "1 hour")
    sdf = streaming.tumbling_agg(
        streaming.read_event_stream(spark, events_path), "1 hour"
    )
    got = streaming.run_available_now(sdf, "tumbling_test")
    cols = ["window_start", "event_type", "n"]
    assert _normalize(got, cols) == _normalize(batch, cols)


def test_tumbling_stream_state_partitions_same_result(spark, events_path, events_batch):
    """state_partitions sizes the stateful shuffle without changing the
    answer, and the session conf is restored immediately after start."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    batch = streaming.tumbling_agg(events_batch, "1 hour")
    sdf = streaming.tumbling_agg(
        streaming.read_event_stream(spark, events_path), "1 hour"
    )
    got = streaming.run_available_now(
        sdf, "tumbling_state_parts_test", state_partitions=3
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    cols = ["window_start", "event_type", "n"]
    assert _normalize(got, cols) == _normalize(batch, cols)


def test_sliding_stream_equals_batch(spark, events_path, events_batch):
    batch = streaming.sliding_agg(events_batch, "2 hours", "1 hour")
    sdf = streaming.sliding_agg(
        streaming.read_event_stream(spark, events_path), "2 hours", "1 hour"
    )
    got = streaming.run_available_now(sdf, "sliding_test")
    cols = ["window_start", "event_type", "n"]
    assert _normalize(got, cols) == _normalize(batch, cols)


def test_session_stream_equals_batch(spark, events_path, events_batch):
    batch = streaming.session_agg(events_batch, "30 minutes")
    # complete mode: append would hold back sessions newer than the
    # final watermark, which on a bounded file never advances past them
    sdf = streaming.session_agg(
        streaming.read_event_stream(spark, events_path), "30 minutes"
    )
    got = streaming.run_available_now(sdf, "session_test", output_mode="complete")
    cols = ["session_start", "user_id", "n"]
    assert _normalize(got, cols) == _normalize(batch, cols)


def test_watermark_accepted(spark, events_path):
    # watermarked tumbling agg in append mode: plan must be streamable
    sdf = streaming.tumbling_agg(
        streaming.read_event_stream(spark, events_path), "1 hour", watermark="2 hours"
    )
    got = streaming.run_available_now(sdf, "wm_test", output_mode="append")
    # append emits only windows the watermark has closed; with a bounded
    # file stream everything but the tail is closed
    assert got.count() > 0


def test_stateful_counter(spark, events_path, events_batch):
    sdf = streaming.stateful_counter(
        streaming.read_event_stream(spark, events_path), "user_id"
    )
    got = streaming.run_available_now(sdf, "counter_test", output_mode="update")
    # final state per user == batch group counts (one availableNow batch)
    latest = {r["user_id"]: r["total_seen"] for r in got.collect()}
    expect = {
        r["user_id"]: r["n"]
        for r in events_batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert latest == expect


def test_stream_dedup_equals_batch_distinct(spark, events_path, events_batch):
    """stream_dedup (unbounded-state regime) keeps exactly one row per
    key — the projected key set equals batch SELECT DISTINCT."""
    sdf = streaming.stream_dedup(
        streaming.read_event_stream(spark, events_path), ["event_type", "user_id"]
    )
    got = streaming.run_available_now(
        sdf.select("event_type", "user_id"), "dedup_test", output_mode="append"
    )
    want = events_batch.select("event_type", "user_id").distinct()
    cols = ["event_type", "user_id"]
    assert _normalize(got, cols) == _normalize(want, cols)


def test_stream_dedup_within_watermark_bounded_state(spark, events_path, events_batch):
    """Bounded-state regime (dropDuplicatesWithinWatermark): on a single
    drained batch every duplicate arrives inside the watermark horizon,
    so the result still equals DISTINCT — while the plan carries the
    state-eviction operator that makes it viable on unbounded streams."""
    sdf = streaming.stream_dedup(
        streaming.read_event_stream(spark, events_path),
        ["event_id"],
        watermark="2 hours",
        within_watermark=True,
    )
    got = streaming.run_available_now(
        sdf.select("event_id"), "dedup_wm_test", output_mode="append"
    )
    assert got.count() == events_batch.select("event_id").distinct().count()


def test_stream_dedup_within_watermark_requires_watermark(spark, events_path):
    with pytest.raises(ValueError):
        streaming.stream_dedup(
            streaming.read_event_stream(spark, events_path),
            ["event_id"],
            within_watermark=True,
        )


def test_write_stream_parquet_exactly_once(spark, sf_dir, tmp_path):
    from gratum_spark import streaming

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sdf = streaming.read_event_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    streaming.write_stream_parquet(sdf, out, ckpt)
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.parquet(out).count() == n_batch

    # re-run with the SAME checkpoint: offsets say everything is already
    # committed -> zero new rows, no duplicates (exactly-once)
    sdf2 = streaming.read_event_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    streaming.write_stream_parquet(sdf2, out, ckpt)
    assert spark.read.parquet(out).count() == n_batch
    assert spark.read.parquet(out).select("event_id").distinct().count() == n_batch


def test_write_stream_parquet_partitioned(spark, sf_dir, tmp_path):
    from gratum_spark import streaming

    out = str(tmp_path / "out_p")
    sdf = streaming.read_event_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "ts"
    )
    streaming.write_stream_parquet(sdf, out, str(tmp_path / "ck2"), partition_by=["event_type"])
    back = spark.read.parquet(out)
    # partition pruning works on the streamed output
    one_type = back.select("event_type").first()["event_type"]
    assert back.filter(back.event_type == one_type).count() > 0


def test_stream_corpus_novel_matches_batch(spark, sf_dir, tmp_path):
    # stream-vs-corpus incremental curation (foreachBatch): draining the
    # new-batch docs as a stream must keep exactly the docs the batch
    # corpus_novel plan keeps, and a re-run with the same checkpoint must
    # not duplicate output (idempotent per-batch overwrite).
    from gratum_spark import streaming
    from gratum_spark.operators.dedup import corpus_novel

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    # materialize the "new batch" as its own parquet dir to stream from
    new_path = str(tmp_path / "new_docs")
    docs.filter(F.col("doc_id") % 10 == 0).write.parquet(new_path)

    expected = sorted(
        r["doc_id"]
        for r in corpus_novel(
            spark.read.parquet(new_path), corpus, "doc_id", "text"
        ).collect()
    )

    out = str(tmp_path / "novel_out")
    ckpt = str(tmp_path / "novel_ckpt")
    stream = spark.readStream.schema(docs.schema).parquet(new_path)
    streaming.stream_corpus_novel(stream, corpus, "doc_id", "text", out, ckpt)
    # plain read of the output dir: batch=<id> discovers as a partition col
    back = spark.read.parquet(out)
    assert "batch" in back.columns
    got = sorted(r["doc_id"] for r in back.collect())
    assert got == expected

    # re-run with the same checkpoint: offsets committed -> no new batches
    stream2 = spark.readStream.schema(docs.schema).parquet(new_path)
    streaming.stream_corpus_novel(stream2, corpus, "doc_id", "text", out, ckpt)
    got2 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got2 == expected

    # stored-index corpus form (production long-running shape): same keep-set
    from gratum_spark.operators.dedup import write_corpus_index

    idx = str(tmp_path / "corpus_idx")
    write_corpus_index(corpus, "doc_id", "text", idx)
    out2 = str(tmp_path / "novel_out_idx")
    stream3 = spark.readStream.schema(docs.schema).parquet(new_path)
    streaming.stream_corpus_novel(stream3, idx, "doc_id", "text", out2,
                                  str(tmp_path / "novel_ckpt_idx"))
    got3 = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())
    assert got3 == expected


def test_canary_scan_stream_equals_batch(spark, sf_dir):
    """canary_scan is a stream-static broadcast join + keyed aggregate:
    the same builder must run under readStream (the 'scan the incoming
    crawl for canaries as it lands' deployment) and match batch."""
    from gratum_spark.operators import text

    docs_b = sources.table(spark, sf_dir, "documents").df
    canaries = docs_b.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("cid"), F.substring("text", 20, 30).alias("ctxt")
    )
    batch = text.canary_scan(docs_b, "doc_id", "text", canaries, "cid", "ctxt")
    sdf = text.canary_scan(
        streaming.read_event_stream(spark, f"{sf_dir}/documents.parquet"),
        "doc_id", "text", canaries, "cid", "ctxt",
    )
    got = streaming.run_available_now(sdf, "canary_stream", output_mode="complete")
    cols = ["id", "n_hits", "first_canary"]
    assert _normalize(got, cols) == _normalize(batch, cols)


def test_decontaminate_stream_equals_batch(spark, sf_dir):
    """decontaminate_embeddings is stateless (closed-over eval matrix,
    no join) so it streams in append mode unchanged."""
    from gratum_spark.operators import similarity

    emb_b = sources.table(spark, sf_dir, "embeddings").df
    eval_df = emb_b.filter(F.col("vec_id") < 5)
    batch = similarity.decontaminate_embeddings(
        emb_b.filter(F.col("vec_id") >= 5), "vec_id", "embedding", eval_df
    )
    stream_src = streaming.read_event_stream(
        spark, f"{sf_dir}/embeddings.parquet"
    ).filter(F.col("vec_id") >= 5)
    sdf = similarity.decontaminate_embeddings(
        stream_src, "vec_id", "embedding", eval_df
    )
    got = streaming.run_available_now(sdf, "decon_stream", output_mode="append")
    cols = ["id", "keep"]
    assert _normalize(got, cols) == _normalize(batch, cols)


def test_interval_join_stream_equals_batch(spark, events_path, events_batch):
    """stream_interval_join builds the same logical plan batch or
    streaming; the availableNow drain must equal the batch interval
    join (views paired with same-user clicks within the next hour)."""
    views_b = events_batch.filter(F.col("event_type") == "view")
    clicks_b = events_batch.filter(F.col("event_type") == "click")
    batch = streaming.stream_interval_join(
        views_b, clicks_b, key="user_id", within="1 hour", watermark=None
    )
    src = streaming.read_event_stream(spark, events_path)
    got = streaming.run_available_now(
        streaming.stream_interval_join(
            src.filter(F.col("event_type") == "view"),
            src.filter(F.col("event_type") == "click"),
            key="user_id",
            within="1 hour",
            watermark="2 hours",
        ),
        "interval_join_stream",
        output_mode="append",
    )
    cols = ["l_event_id", "r_event_id"]
    assert _normalize(got, cols) == _normalize(batch, cols)
    assert got.count() > 0


def test_interval_join_bounds_pairs(spark, events_batch):
    """Every emitted pair respects the [0, within] event-time bound and
    the key equality — the condition Spark uses to evict join state."""
    views = events_batch.filter(F.col("event_type") == "view")
    clicks = events_batch.filter(F.col("event_type") == "click")
    out = streaming.stream_interval_join(
        views, clicks, key="user_id", within="30 minutes", watermark=None
    )
    bad = out.filter(
        (F.col("l_user_id") != F.col("r_user_id"))
        | (F.col("r_ts") < F.col("l_ts"))
        | (F.col("r_ts") > F.col("l_ts") + F.expr("interval 30 minutes"))
    )
    assert bad.count() == 0
