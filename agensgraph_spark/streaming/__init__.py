from agensgraph_spark.streaming.ingest import (  # noqa: F401
    stream_file_source,
    windowed_event_counts,
    stream_append_label,
)
