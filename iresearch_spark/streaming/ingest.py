"""Structured Streaming ingest: documents stream -> micro-segments.

The streaming analogue of the reference's continuous IndexWriter ingest
loop (insert batches + periodic commit + background consolidation,
utils/index-put.cpp:424-457): each micro-batch becomes one immutable
segment committed to the manifest; the tiered consolidation policy
(index/merge.py) later folds micro-segments together, exactly like the
reference's consolidation threads.

Exactly-once: the streaming checkpoint (source offsets) + idempotent
segment naming (seg name = f"{prefix}{batch_id}", rebuild overwrites the
same directory before the manifest swap) make replayed batches harmless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from iresearch_spark.analysis.analyzers import Analyzer
from iresearch_spark.index.segments import IndexStore, build_segment


def stream_build_index(
    spark: SparkSession,
    store: IndexStore,
    source: DataFrame,
    checkpoint_dir: str,
    text_col: str = "content",
    key_cols: list[str] | None = None,
    doc_id_col: str | None = None,
    analyzer: Analyzer | None = None,
    seg_prefix: str = "stream",
    available_now: bool = True,
    processing_time: str = "10 seconds",
) -> StreamingQuery:
    """source must be a streaming DataFrame (spark.readStream...).

    available_now=True drains whatever is available then stops (batch-like
    test mode); otherwise a continuous trigger with `processing_time`
    cadence (the reference's commit-period analogue).
    """

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_segment(
            batch_df.sparkSession,
            store,
            batch_df,
            f"{seg_prefix}{batch_id}",
            text_col=text_col,
            key_cols=key_cols,
            doc_id_col=doc_id_col,
            analyzer=analyzer,
        )

    writer = (
        source.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def sessionize_events(
    events: DataFrame,
    gap_seconds: int = 300,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-key session windows closed after `gap_seconds` of inactivity.

    Emits CLOSED sessions only: when a batch's events for a key arrive,
    they merge into the open session if within the gap, otherwise the open
    session is emitted and a new one starts. The open session persists in
    the state store across micro-batches (the "custom stateful operator"
    surface Structured Streaming exposes for semantics its built-in
    windows can't express — session gaps keyed on activity, not wall
    clock). Output: (key, session_start, session_end, n_events, sum_value).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", IntegerType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", DoubleType()),  # epoch seconds
            StructField("end", DoubleType()),
            StructField("n", IntegerType()),
            StructField("sum_value", DoubleType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        rows = []
        cur = state.get if state.exists else None  # (start, end, n, sum)
        cur = list(cur) if cur is not None else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            ts = pdf[ts_col].astype("int64").to_numpy() / 1e9
            vals = pdf[value_col].to_numpy()
            for t, v in zip(ts, vals):
                if cur is not None and t - cur[1] <= gap_seconds:
                    cur[1] = max(cur[1], float(t))
                    cur[2] += 1
                    cur[3] += float(v)
                else:
                    if cur is not None:
                        rows.append(cur)
                    cur = [float(t), float(t), 1, float(v)]
        if cur is not None:
            state.update(tuple(cur))
        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "session_start": pd.to_datetime([r[0] for r in rows], unit="s"),
                    "session_end": pd.to_datetime([r[1] for r in rows], unit="s"),
                    "n_events": [r[2] for r in rows],
                    "sum_value": [r[3] for r in rows],
                }
            )

    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked windowed aggregation over an event stream (late data
    dropped past the watermark): per (window, event_type) count + value sum.
    Works on both streaming and batch DataFrames (batch ignores watermark
    semantics but produces the same windows)."""
    # parquet TIMESTAMP_NTZ is not a valid event-time type; widen to LTZ
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # half-up 6-dp rounding via floor — ROUND() differs between
            # engines at representation boundaries; this expression is the
            # one the DuckDB oracle evaluates, bit-identically
            F.expr(
                "CAST(floor(SUM(value) * 1000000e0 + 0.5e0) / 1000000e0 AS DOUBLE)"
            ).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
