"""Incrementally-maintained EXACT distinct counts (streaming bitmap
words).

The batch twin is ``agg_bitmap_distinct`` (queries_r3.py): dense integer
keys pack 32-per-long (word = id div 32, bit = id mod 32), words OR
together, popcount-sum is the exact cardinality.  This module maintains
the word table INCREMENTALLY over an event stream on the shared
``EpochStore`` protocol (``streaming/epoch_store.py``) — each
micro-batch overwrites only its own ``epoch=<id>`` partial, so crash
replays are idempotent.  Bitmap state is even friendlier to that
protocol than sums: OR is idempotent as well as associative, so even a
DOUBLE-merged epoch cannot change the answer.

Compaction folds the partials into a ``base-v<N>`` directory — a
namespace that can never collide with a stream batchId (writing the
fold to ``epoch=<max+1>`` would be overwritten by the checkpoint's next
micro-batch, silently undercounting; see epoch_store docstring).

Scale notes: the per-batch shuffle is on (event_type, word) with
map-side partial bit_or — 32x key-space reduction before the wire; the
merge-on-read re-ORs epoch partials whose size is words-not-rows.  The
reference's only streaming aggregate is a per-stream record count
(target_parquet/writers.py:52-74); distinct users is exactly the metric
it cannot maintain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .epoch_store import EpochStore

__all__ = ["StreamingBitmapDistinct"]

_BIT = "shiftleft(cast(1 as bigint), cast(user_id % 32 as int))"


class StreamingBitmapDistinct:
    """Per-event_type exact distinct user_id counts, incrementally
    maintained from a stream of raw events via mergeable bitmap words."""

    def __init__(
        self, spark: SparkSession, out_dir: str, checkpoint: str | None = None
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._store = EpochStore(
            spark, out_dir, "event_type string, word bigint, bits bigint"
        )

    # -- write path ----------------------------------------------------------

    def start(self, events: DataFrame, available_now: bool = False):
        writer = (
            events.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("events-bitmap-distinct")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy(
            "event_type", F.expr("user_id div 32").alias("word")
        ).agg(F.bit_or(F.expr(_BIT)).alias("bits"))
        self._store.write_epoch(delta, epoch_id)

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _fold(df: DataFrame) -> DataFrame:
        return (
            df.select("event_type", "word", "bits")
            .groupBy("event_type", "word")
            .agg(F.bit_or("bits").alias("bits"))
        )

    def words(self) -> DataFrame:
        """Merged word table: base + epoch partials re-ORed — the same
        state one global batch pass would produce."""
        return self._fold(self._store.state_df())

    def counts(self) -> DataFrame:
        """Exact distinct user_id per event_type from the merged words."""
        return self.words().groupBy("event_type").agg(
            F.sum(F.bit_count("bits")).cast("long").alias("n_distinct_users")
        )

    def compact(self) -> None:
        """Fold all current partials into one ``base-v<N>`` directory.
        Safe to run while the stream is live: future batchIds land in
        ``epoch=*`` and merge with the base on read; a no-op when there
        is nothing to fold."""
        self._store.compact(self._fold)
