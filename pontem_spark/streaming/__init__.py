"""Structured Streaming twins of the batch event queries.

The reference has no streaming at all (SURVEY §2.G). Here the same logical
transformations run over ``readStream`` with watermarks for late data; batch
and stream share the aggregation expressions, so correctness of the stream
is checked differentially against the batch result on the same files.
"""

from pontem_spark.streaming.events import (
    read_event_stream,
    hourly_rollup,
    session_windows,
    run_to_memory,
    stream_stream_attribution,
)

__all__ = [
    "read_event_stream",
    "hourly_rollup",
    "session_windows",
    "run_to_memory",
    "stream_stream_attribution",
]
