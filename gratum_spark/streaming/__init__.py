"""Structured Streaming operators over event streams.

Beyond-reference capability: gratum's "streaming" is push-based row
iteration with no event-time semantics (SURVEY §1.2 — no watermarks, no
windows, no late-data handling anywhere in the reference). Here the
batch window aggregations from plans/queries (tumbling/sliding/session)
are expressed as plans that run identically under ``readStream``:

  * builders in this module take ANY DataFrame — batch or streaming —
    because Spark's window aggregations are the same logical plan in
    both modes. Correctness is checked in batch (DuckDB oracle); the
    streaming tests re-run the same builder under a file stream with an
    ``availableNow`` trigger and assert identical results.
  * watermarks bound state for real streams: pass ``watermark=`` to
    enable dropping of late data + state eviction at scale.

Scale posture: stateful streaming aggregations shuffle on the grouping
key exactly like batch; state lives in the state store (RocksDB on a
real cluster). ``stateful_counter`` shows the custom-state surface
(applyInPandasWithState) used for operators windows can't express.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

__all__ = [
    "read_event_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stateful_counter",
    "stream_dedup",
    "stream_interval_join",
    "stream_corpus_novel",
    "write_stream_parquet",
    "run_available_now",
]


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    ts_col: str = "ts",  # kept for API compat; typing now covers all columns
) -> DataFrame:
    """File-based event stream (parquet dir). Schema is required by
    readStream; by default it is inferred from a one-file batch read.
    Applies the same timestamp typing as sources.parquet (nanos ->
    micros, NTZ -> TimestampType, every column) so batch and stream
    plans over the same files see identical types."""
    from ..sources import (
        _PARQUET_META_MEMO,
        _PARQUET_META_MEMO_CAP,
        _convert_nanos_cols,
        _ensure_nanos_readable,
        _nanos_ts_cols,
        _normalize_ntz,
        _parquet_fingerprint,
        _scoped_conf,
    )

    if schema is None:
        _ensure_nanos_readable(spark)
        # same metadata memo as sources.parquet: schema inference is
        # ~50-60 ms of driver time per call, fingerprint-invalidated
        fp = _parquet_fingerprint(path)
        memo_key = (path, fp) if fp is not None else None
        cached = _PARQUET_META_MEMO.get(memo_key) if memo_key is not None else None
        if cached is not None:
            schema, nanos_cols = cached
        else:
            with _scoped_conf(
                spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
            ):
                schema = spark.read.parquet(path).schema
            nanos_cols = _nanos_ts_cols(path)
            if memo_key is not None:
                if len(_PARQUET_META_MEMO) >= _PARQUET_META_MEMO_CAP:
                    _PARQUET_META_MEMO.clear()
                _PARQUET_META_MEMO[memo_key] = (schema, nanos_cols)
    else:
        nanos_cols = _nanos_ts_cols(path)
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        # the file stream source wants a directory; point it at the
        # parent and glob the single file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    sdf = reader.parquet(path)
    # Same typing pipeline as the batch source (sources.parquet): legacy
    # TIMESTAMP(NANOS) bigints -> micros timestamps for ALL nanos
    # columns, then every remaining TIMESTAMP_NTZ column (inference conf
    # couldn't be applied, or a caller-supplied schema says so) re-tagged
    # to TimestampType — so batch and stream plans over the same files
    # always see identical types on every column, not just ts_col.
    return _normalize_ntz(_convert_nanos_cols(sdf, nanos_cols))


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark else df


def tumbling_agg(
    df: DataFrame,
    window: str = "1 hour",
    keys: Iterable[str] = ("event_type",),
    ts_col: str = "ts",
    watermark: str | None = None,
    **aggs: F.Column,
) -> DataFrame:
    """Tumbling event-time window aggregation — identical plan batch or
    streaming. Default aggregate: count(*) as n."""
    aggs = aggs or {"n": F.count("*")}
    return (
        _with_watermark(df, ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def sliding_agg(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    keys: Iterable[str] = ("event_type",),
    ts_col: str = "ts",
    watermark: str | None = None,
    **aggs: F.Column,
) -> DataFrame:
    """Sliding (hopping) window aggregation."""
    aggs = aggs or {"n": F.count("*")}
    return (
        _with_watermark(df, ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def session_agg(
    df: DataFrame,
    gap: str = "30 minutes",
    keys: Iterable[str] = ("user_id",),
    ts_col: str = "ts",
    watermark: str | None = None,
    **aggs: F.Column,
) -> DataFrame:
    """Session windows (dynamic-gap close after ``gap`` inactivity) via
    F.session_window — state is evicted once the watermark passes a
    session's close, which is what makes this viable on unbounded
    streams."""
    aggs = aggs or {"n": F.count("*")}
    return (
        _with_watermark(df, ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            *aggs.keys(),
        )
    )


def stream_dedup(
    df: DataFrame,
    keys: Iterable[str],
    ts_col: str = "ts",
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Exact deduplication on a stream — the streaming face of
    operators.dedup.exact_dedup (same one-shuffle-on-keys plan; state
    store instead of a hash aggregate). First occurrence wins, like the
    batch operator and the reference's `unique` (Pipeline.groovy
    uniqueness semantics).

    Two state regimes, chosen by how duplicates arrive:

    - ``within_watermark=False``: ``dropDuplicates(keys)`` — state keeps
      every key ever seen. Exact over the whole stream, but state grows
      with |distinct keys|; right for bounded backfills and replay.
    - ``within_watermark=True`` (requires ``watermark``):
      ``dropDuplicatesWithinWatermark`` — a key's state is evicted once
      the watermark passes it, so state is bounded by the watermark
      horizon. The continuous-ingestion mode at 100 TB/day, where a
      document's duplicates (retries, multi-source crawls) arrive near
      each other in event time.
    """
    keys = list(keys)
    if within_watermark:
        if not watermark:
            raise ValueError("within_watermark=True requires a watermark")
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.dropDuplicates(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval (event-time) join: pair each left row
    with every right row sharing ``key`` whose timestamp falls in
    [left_ts, left_ts + within] — the attribution shape (view→click,
    impression→conversion, request→error).

    Works identically on batch and streaming DataFrames (same logical
    plan). Under streaming, BOTH sides carry a watermark and the join
    condition bounds event time on both inputs, which is exactly what
    Spark needs to evict state: a left row is dropped from the state
    store once the right watermark passes ``left_ts + within``, and a
    right row once the left watermark passes ``right_ts`` — so state is
    bounded by the interval + watermark horizon, not the stream length.
    At 100 TB/day, that bound (not the join itself) is what makes the
    operator runnable continuously.

    All columns are prefixed (``l_``/``r_``) so self-joins of one event
    stream against itself — the common case — are unambiguous.
    ``how='leftOuter'`` emits unmatched left rows with nulls once the
    watermark proves no match can still arrive (streaming outer-join
    semantics); batch outer joins emit them immediately.
    """
    l = left.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    if watermark:
        l = l.withWatermark(f"{left_prefix}{left_ts}", watermark)
        r = r.withWatermark(f"{right_prefix}{right_ts}", watermark)
    lt = F.col(f"{left_prefix}{left_ts}")
    rt = F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(f"{left_prefix}{key}") == F.col(f"{right_prefix}{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"interval {within}"))
    )
    return l.join(r, cond, how)


def stateful_counter(
    df: DataFrame,
    key: str = "user_id",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful operator: running per-key event count across
    micro-batches via applyInPandasWithState — the surface for stateful
    logic windows can't express (counters, custom sessionization, CEP).

    Emits one row per key per micro-batch: (key, total_seen)."""
    import pandas as pd

    out_schema = f"{key} long, total_seen long"
    state_schema = "count long"

    def update(key_tuple, pdfs, state: GroupState):
        n = sum(len(pdf) for pdf in pdfs)
        if state.exists:
            (prev,) = state.get
        else:
            prev = 0
        total = prev + n
        state.update((total,))
        yield pd.DataFrame({key: [key_tuple[0]], "total_seen": [total]})

    return df.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def write_stream_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Iterable[str] | None = None,
    available_now: bool = True,
):
    """Exactly-once file sink: parquet + checkpoint.

    The streaming file sink commits output files through a write-ahead
    sink log keyed by batch id, and the checkpoint stores source offsets
    — so a crashed/restarted query (or a re-run with the same
    checkpoint) resumes from the last committed batch and NEVER
    duplicates rows in the output, the property a 100 TB ingestion
    pipeline actually needs from its sink. ``available_now=True`` drains
    what exists and stops (batch-style backfill); False runs
    continuously. Returns the StreamingQuery; availableNow waits for
    termination.
    """
    w = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*list(partition_by))
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.start()
    return q


def stream_corpus_novel(
    stream_df: DataFrame,
    corpus_df: "DataFrame | str",
    id_col: str,
    text_col: str,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    **dedup_kw,
):
    """Streaming incremental curation: drop arriving documents that
    near-duplicate a STATIC corpus, append the novel ones to parquet —
    the continuous form of ``operators.dedup.corpus_novel``.

    Per-doc near-dup filtering needs candidate pairs grouped back to the
    doc (a per-batch distinct), which Structured Streaming can't express
    statelessly in one plan — so this uses the standard foreachBatch
    pattern: each micro-batch runs the BATCH corpus_novel plan against
    the static corpus and writes its keep-set. Idempotent output: every
    batch writes to its own ``batch=<id>`` subdirectory with
    mode=overwrite, so a replayed micro-batch (foreachBatch is
    at-least-once on retry) overwrites its own files instead of
    duplicating rows; the checkpoint pins source offsets per batch id,
    making the pair effectively exactly-once. Reading ``path`` back
    with spark.read.parquet discovers ``batch`` as a partition column
    (no underscore prefix — Hadoop readers hide ``_``-prefixed paths).

    ``corpus_df`` may be a DataFrame (each micro-batch re-evaluates the
    corpus signatures — fine for small/cached corpora) or a STRING path
    to a persisted index from ``dedup.write_corpus_index`` — the
    long-running production form: every micro-batch answers from two
    parquet scans of the index instead of re-hashing corpus text.
    Returns the StreamingQuery; availableNow waits for termination.
    """
    from ..operators.dedup import corpus_novel, corpus_novel_stored

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if isinstance(corpus_df, str):
            out = corpus_novel_stored(batch_df, corpus_df, id_col, text_col)
        else:
            out = corpus_novel(batch_df, corpus_df, id_col, text_col, **dedup_kw)
        out.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    w = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = w.start()
    return q


def run_available_now(
    sdf: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain all currently-available input through a streaming query
    (trigger availableNow) into an in-memory table and return it.

    The batch-equivalence test harness: same builder + availableNow must
    equal the batch run. On a cluster you'd writeStream to parquet/Kafka
    with a real trigger instead.

    ``state_partitions`` sizes the STATEFUL shuffle for queries whose
    key space is bounded by construction (e.g. a tumbling count keyed on
    a low-cardinality type column): Structured Streaming pins the
    partition count at query birth (the state-store layout depends on
    it) and gets no AQE coalescing, so the session's batch-oriented
    shuffle width buys one near-empty state store + commit per partition
    per micro-batch. Pass it ONLY when the state is provably small at
    any input scale — it sizes to the state, not to the input; leave it
    None (session conf) for unbounded keys (users, event ids). Results
    are partition-count independent (keyed aggregates)."""
    spark = sdf.sparkSession
    old_parts = None
    if state_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # the streaming query captured the conf at .start(); restore the
        # session value immediately so concurrent/batch plans are unaffected
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    q.awaitTermination()
    return spark.table(query_name)
