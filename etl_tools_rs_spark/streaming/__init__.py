"""Structured Streaming surface.

The reference's genuinely unbounded pieces (SURVEY §7.4): queue consumers
(QueueClient, etl-core/src/queue/mod.rs:9-31) and no-max EnumerateStream
(enumerate.rs with pause). The reference has NO watermark/event-time
semantics to match — arrival-ordered with backpressure only — so the
engine exposes Spark-native streaming (watermarks, windows, checkpoints) as
a strict superset.
"""

from etl_tools_rs_spark.streaming.sources import (  # noqa: F401
    file_stream,
    rate_stream,
)
from etl_tools_rs_spark.streaming.ops import (  # noqa: F401
    foreach_batch_sinks,
    sessionize,
    stateful_counts,
    windowed_agg,
)
