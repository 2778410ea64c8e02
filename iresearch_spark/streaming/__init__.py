from iresearch_spark.streaming.ingest import (  # noqa: F401
    stream_build_index,
    windowed_event_stats,
)
