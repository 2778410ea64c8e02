"""Streaming ingest test: parquet file stream -> micro-segments ->
consolidation -> queryable index equal to a batch build."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.merge import consolidate
from iresearch_spark.index.segments import IndexStore
from iresearch_spark.search import SearchEngine, Term
from iresearch_spark.streaming import stream_build_index, windowed_event_stats


def test_stream_ingest_builds_segments(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "index")
    os.makedirs(src_dir)

    corpus = generate_corpus(spark, 120, seed=23).persist()
    # two "arrival" files
    h = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(2))
    corpus.where(h == 0).coalesce(1).write.mode("append").parquet(src_dir)
    corpus.where(h == 1).coalesce(1).write.mode("append").parquet(src_dir)

    schema = corpus.schema
    store = IndexStore(root)
    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_build_index(spark, store, source, ckpt)
    q.awaitTermination(300)

    m = store.current()
    assert m.docs_count == 120
    assert len(m.segments) >= 1  # micro-segments (1 per non-empty batch)

    # consolidation folds micro-segments; index stays queryable
    consolidate(spark, store)
    eng = SearchEngine(spark, store)
    rows = eng.topk(Term("def"), 5).collect()
    assert rows


def test_windowed_event_stats_batch_parity(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_stats(events, window="1 hour").collect()
    assert len(out) > 0
    total = sum(r["n_events"] for r in out)
    assert total == events.count()


def test_windowed_event_stats_streaming(spark, sf_dir, tmp_path):
    src = str(tmp_path / "ev")
    spark.read.parquet(f"{sf_dir}/events.parquet").coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = windowed_event_stats(stream, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("evagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select sum(n_events) as n from evagg").collect()[0]["n"]
    assert got == spark.read.parquet(src).count()


def test_sessionize_events_stateful(spark, tmp_path):
    """applyInPandasWithState session windows: state carries the open
    session across micro-batches (maxFilesPerTrigger=1 forces two), closed
    sessions emitted exactly once."""
    import datetime as dt

    from iresearch_spark.streaming.ingest import sessionize_events

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(mins, typ="click", val=1.0):
        return (t0 + dt.timedelta(minutes=mins), typ, val)

    src = str(tmp_path / "events_src")
    schema = "ts timestamp, event_type string, value double"
    # batch 1: one session (0-2 min) then a gap; batch 2 extends nothing ->
    # closes session A when session B starts at minute 30
    spark.createDataFrame([ev(0), ev(1), ev(2)], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/f1")
    spark.createDataFrame([ev(30), ev(31)], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/f*")
    )
    out = sessionize_events(stream, gap_seconds=300)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    closed = [(r["n_events"], r["sum_value"]) for r in rows]
    # only session A (3 events) closes; session B stays open in state
    assert closed == [(3, 3.0)], rows
    assert rows[0]["session_start"] == t0
    assert rows[0]["session_end"] == t0 + dt.timedelta(minutes=2)
