"""Streaming twin of ``multimodal_corpus_profile`` (queries_r14.py):
the media-lake ingest census maintained incrementally.

Each micro-batch of (media_id, media) payloads is sniff-routed and
REALLY decoded inside the foreachBatch (the same
``operators/multimodal.media_profile`` Arrow seam the batch query
uses), reduced to per-format partials (n_items, total_units,
value_sum), and written as an EpochStore partial — replay-idempotent,
manifest-guarded compaction, same protocol as the rollup/forecast
stores.  The read path folds partials by summing, so stream == batch is
exact integer equality and code-path equality at once: the heavy
per-payload work is the batch operator's own body; only the mergeable
5-row-per-format reduction is stream-specific.

Scale notes (100 TB ingest): per-batch cost tracks |batch| — payloads
never leave the decoding task and the shuffle per batch is at most one
row per format per task.  State is one row per format per epoch;
``compact`` keeps the partial count bounded regardless of stream
lifetime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .epoch_store import EpochStore

__all__ = ["StreamingMediaProfile"]


class StreamingMediaProfile:
    """(format -> n_items/total_units/value_sum partials) state over a
    stream of binary media payloads."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        checkpoint: str | None = None,
    ):
        self.spark = spark
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._store = EpochStore(
            spark,
            out_dir,
            "format string, n_items long, n_units long, value_sum long",
        )

    # -- write path ----------------------------------------------------------

    def start(self, stream: DataFrame, available_now: bool = False):
        writer = (
            stream.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("media-profile")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from target_parquet_spark.operators.multimodal import media_profile

        delta = media_profile(batch_df).groupBy("format").agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("n_units").cast("long").alias("n_units"),
            F.sum("value_sum").cast("long").alias("value_sum"),
        )
        self._store.write_epoch(delta, epoch_id)

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _fold(df: DataFrame) -> DataFrame:
        return (
            df.select("format", "n_items", "n_units", "value_sum")
            .groupBy("format")
            .agg(
                F.sum("n_items").alias("n_items"),
                F.sum("n_units").alias("n_units"),
                F.sum("value_sum").alias("value_sum"),
            )
        )

    def read_profile(self) -> DataFrame:
        """The merged per-format census, column-named to match the batch
        query's contract (format, n_items, total_units, value_sum)."""
        return self._fold(self._store.state_df()).select(
            "format",
            "n_items",
            F.col("n_units").alias("total_units"),
            "value_sum",
        )

    def compact(self) -> None:
        """Fold partials into ``base-v<N>`` (manifest-guarded; safe while
        the stream is live; no-op when empty)."""
        self._store.compact(self._fold)
