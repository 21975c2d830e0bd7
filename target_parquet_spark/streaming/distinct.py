"""Incrementally-maintained EXACT distinct counts (streaming bitmap
words).

The batch twin is ``agg_bitmap_distinct`` (queries_r3.py): dense integer
keys pack 32-per-long (word = id div 32, bit = id mod 32), words OR
together, popcount-sum is the exact cardinality.  This module maintains
the word table INCREMENTALLY over an event stream with the same
epoch-directory protocol as ``streaming/rollup.py`` — each micro-batch
overwrites only its own ``epoch=<id>`` partial, so crash replays are
idempotent.  Bitmap state is even friendlier to that protocol than sums:
OR is idempotent as well as associative, so even a DOUBLE-merged epoch
cannot change the answer.

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
        delta.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={int(epoch_id)}")
        )

    # -- read path -----------------------------------------------------------

    def words(self) -> DataFrame:
        """Merged word table: epoch partials re-ORed — the same state one
        global batch pass would produce."""
        df = self.spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "epoch=*")
        )
        return df.groupBy("event_type", "word").agg(
            F.bit_or("bits").alias("bits")
        )

    def counts(self) -> DataFrame:
        """Exact distinct user_id per event_type from the merged words."""
        return self.words().groupBy("event_type").agg(
            F.sum(F.bit_count("bits")).cast("long").alias("n_distinct_users")
        )

    def compact(self) -> None:
        """Fold all epoch partials into one directory (OR is associative
        and idempotent, so readers racing a compaction see identical
        counts either way)."""
        import shutil

        merged = self.words()
        epochs = [
            d
            for d in os.listdir(self.out_dir)
            if d.startswith("epoch=") and d != "_checkpoint"
        ]
        next_id = 1 + max(int(d.split("=", 1)[1]) for d in epochs)
        merged.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={next_id}")
        )
        for d in epochs:
            shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)
