"""Incrementally-maintained continuous aggregate (streaming rollup).

The batch twin lives in ``io/layout.ensure_rollup`` (day-grain
sufficient statistics of `events`); this module maintains the same
rollup INCREMENTALLY over an event stream — the hypertable/materialized
-view pattern the reference cannot express (its only aggregation is the
per-stream record count, reference target_parquet/writers.py:52-74).

Exactly-once on plain parquet, without a transactional table format:
each micro-batch writes its partial aggregate to an ``epoch=<id>``
directory, OVERWRITING that directory alone.  Replays of an epoch (after
a crash between write and checkpoint commit) rewrite the identical
partial — idempotent — and never touch other epochs' data.  Readers
merge the partials (counts add, sums add), which is cheap because
partials are tiny relative to the base stream; ``compact`` folds all
current epochs into one to bound the directory count.

Scale notes: the per-batch aggregate is a map-side-combined shuffle on
(day, event_type) — cardinality ~days x types, thousands at most, so
the shuffle is bytes.  The merge-on-read groupBy is over n_epochs x
that cardinality; compaction keeps n_epochs bounded.  State never lives
in the streaming engine (no watermark needed, arbitrarily late data
just lands in its day's partial) — the store IS the state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["StreamingRollup"]


class StreamingRollup:
    """Day-grain (day, event_type) -> (n_events, sum_value) rollup,
    incrementally maintained from a stream of raw events."""

    def __init__(self, spark: SparkSession, out_dir: str, checkpoint: str | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")

    # -- write path ----------------------------------------------------------

    def start(self, events: DataFrame, available_now: bool = False):
        """Attach to a streaming events frame (ts, event_type, value, ...)
        and maintain the rollup.  Returns the StreamingQuery."""
        writer = (
            events.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("events-rollup")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        # Overwrite THIS epoch's directory only: replay-idempotent.
        delta.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={int(epoch_id)}")
        )

    # -- read path -----------------------------------------------------------

    def read(self) -> DataFrame:
        """Merged rollup: counts and sums folded across epoch partials."""
        df = self.spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "epoch=*")
        )
        return df.groupBy("day", "event_type").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )

    def compact(self) -> None:
        """Fold all epoch partials into a single fresh epoch directory and
        drop the old ones.  Readers racing a compaction see either layout
        — both merge to identical totals (the fold is associative)."""
        import shutil

        merged = self.read()
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
