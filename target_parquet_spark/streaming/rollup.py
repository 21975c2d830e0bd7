"""Incrementally-maintained continuous aggregate (streaming rollup).

The batch twin lives in ``io/layout.ensure_rollup`` (day-grain
sufficient statistics of `events`); this module maintains the same
rollup INCREMENTALLY over an event stream — the hypertable/materialized
-view pattern the reference cannot express (its only aggregation is the
per-stream record count, reference target_parquet/writers.py:52-74).

Exactly-once on plain parquet, without a transactional table format,
via the shared ``EpochStore`` protocol (``streaming/epoch_store.py``):
each micro-batch writes its partial aggregate to an ``epoch=<id>``
directory, OVERWRITING that directory alone.  Replays of an epoch
(after a crash between write and checkpoint commit) rewrite the
identical partial — idempotent — and never touch other epochs' data.
Readers merge the partials (counts add, sums add), which is cheap
because partials are tiny relative to the base stream; ``compact``
folds current partials into a ``base-v<N>`` directory whose namespace
can never collide with a stream batchId, and records what it folded in
a manifest so a racing reader never double-counts (sums, unlike bitmap
ORs, are NOT idempotent — the manifest is load-bearing here).

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

from .epoch_store import EpochStore

__all__ = ["StreamingRollup"]


class StreamingRollup:
    """Day-grain (day, event_type) -> (n_events, sum_value) rollup,
    incrementally maintained from a stream of raw events."""

    def __init__(self, spark: SparkSession, out_dir: str, checkpoint: str | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._store = EpochStore(
            spark,
            out_dir,
            "day timestamp, event_type string, n_events bigint, sum_value double",
        )

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
        self._store.write_epoch(delta, epoch_id)

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _fold(df: DataFrame) -> DataFrame:
        return (
            df.select("day", "event_type", "n_events", "sum_value")
            .groupBy("day", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )

    def read(self) -> DataFrame:
        """Merged rollup: counts and sums folded across base + epochs."""
        return self._fold(self._store.state_df())

    def compact(self) -> None:
        """Fold all current partials into one ``base-v<N>`` directory.
        Safe to run while the stream is live: future batchIds land in
        ``epoch=*`` and merge with the base on read; a no-op when there
        is nothing to fold."""
        self._store.compact(self._fold)

    def k_anonymity(self, k: int = 5) -> DataFrame:
        """Incremental release gate: the k-anonymity audit
        (``audit_k_anonymity``'s exact shape — group sizes over the
        (event_type, day) quasi-identifier) computed FROM the maintained
        rollup instead of the raw events.  The QI grain IS the rollup
        grain, so the audit's input is the store's few-hundred-row merged
        state — a continuously-ingesting pipeline can gate every export
        on it without ever re-scanning history, and arbitrarily late
        data lands in its day's partial and is audited on the next
        read."""
        from target_parquet_spark.audits import k_anonymity_report

        return k_anonymity_report(self.read(), "n_events", k)
