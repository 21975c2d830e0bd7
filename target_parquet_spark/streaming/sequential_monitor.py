"""Streaming sequential A/B monitor: the mSPRT read-out maintained
incrementally over an event stream.

Batch twin: ``queries_r10.events_msprt_monitor`` — both surfaces share
the literal read-out code (``queries_r10.msprt_readout``), so the
always-valid math cannot drift between them.  The reference implements
no monitoring at all (its only aggregate is the per-stream record
count, reference target_parquet/writers.py:52-74); this is the
"peeking-safe experiment dashboard" shape every experimentation
platform maintains continuously.

State protocol: the shared ``EpochStore`` (exactly-once on plain
parquet — see streaming/rollup.py for the full contract).  Partials
are kept at (day, user_id) grain, NOT (day, arm) power sums: a user's
day can straddle micro-batches, and second moments of per-user-day
spend do not decompose across partial sums of the same user-day —
(day, user) partials merge correctly by plain addition, and the read
path squares only the merged totals.

Scale notes: the per-batch aggregate shuffles on (day, user_id) —
map-side combined, bounded by active users/day; the read path is the
batch query's own plan over the merged store (one (day, arm) aggregate
+ windows over |days| rows).  Late events land in their day's partial
and simply update that day's read-out on the next read — no watermark,
the store is the state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .epoch_store import EpochStore

__all__ = ["StreamingSequentialMonitor"]


class StreamingSequentialMonitor:
    """(day, user_id) -> sum_cents partials; ``read()`` returns the
    same schema as ``events_msprt_monitor``."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        checkpoint: str | None = None,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._store = EpochStore(
            spark,
            out_dir,
            "day date, user_id bigint, sum_micro bigint",
        )

    # -- write path ----------------------------------------------------------

    def start(self, events: DataFrame, available_now: bool = False):
        """Attach to a streaming events frame (ts, user_id, value, ...)
        and maintain the per-user-day partials.  Returns the
        StreamingQuery."""
        writer = (
            events.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("sequential-monitor")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # partials in MICRO-units of value: per-epoch cent rounding
        # would drift from the batch twin when a user-day's sub-cent
        # values split across micro-batches; micro partials add exactly
        # and round to cents once, at read
        delta = batch_df.groupBy(
            F.col("ts").cast("date").alias("day"),
            F.col("user_id"),
        ).agg(
            F.round(F.sum("value") * 1000000).cast("long").alias("sum_micro")
        )
        self._store.write_epoch(delta, epoch_id)

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _fold(df: DataFrame) -> DataFrame:
        return (
            df.select("day", "user_id", "sum_micro")
            .groupBy("day", "user_id")
            .agg(F.sum("sum_micro").cast("long").alias("sum_micro"))
        )

    def read(self) -> DataFrame:
        """The monitor read-out (same schema and values as the batch
        ``events_msprt_monitor`` over the ingested events)."""
        from target_parquet_spark.queries_ops import _hash_mod
        from target_parquet_spark.queries_r10 import msprt_readout

        obs = self._fold(self._store.state_df()).select(
            "day",
            _hash_mod(F.col("user_id"), 2).alias("arm"),
            F.round(F.col("sum_micro") / 10000.0).cast("long").alias("v"),
        )
        return msprt_readout(obs)

    def compact(self) -> None:
        """Fold current partials into a base directory (see
        EpochStore.compact)."""
        self._store.compact(self._fold)
