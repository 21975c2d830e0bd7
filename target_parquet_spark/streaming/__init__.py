"""Structured Streaming layer (SURVEY §7 M4).

The reference's only streaming notions are the per-stream batch buffer and
STATE passthrough (reference target_parquet/sinks.py:118,145-175 and the
singer-sdk drain loop); this package is the Spark-native generalization:

- ``singer_stream.SingerStreamTarget`` — unbounded Singer ingestion via
  ``readStream`` + ``foreachBatch`` (micro-batch == the reference's batch
  buffer, checkpoint == STATE).
- ``windows`` — watermarked tumbling / sliding / session windows and
  streaming deduplication over event streams (absent category §2.10).
- ``stateful`` — custom per-key state machines via
  ``applyInPandasWithState``.
"""

from target_parquet_spark.streaming.singer_stream import SingerStreamTarget
from target_parquet_spark.streaming.windows import (
    session_agg,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)
from target_parquet_spark.streaming.stateful import running_user_totals
from target_parquet_spark.streaming.rollup import StreamingRollup

__all__ = [
    "SingerStreamTarget",
    "StreamingRollup",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "streaming_dedup",
    "running_user_totals",
]
