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
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
