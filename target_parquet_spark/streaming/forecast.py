"""Incrementally-maintained forecast state (streaming twins of
``events_holt_forecast`` and ``events_seasonal_decompose`` in
queries_r12.py — VERDICT r7 #8).

Both batch queries are a data-sized daily aggregate followed by
metadata-sized math (a one-row-per-day recursion; windows over weeks of
days).  The mergeable state is therefore the DAILY REVENUE SERIES
itself: per-day partial sums maintained with the same EpochStore
protocol as the rollup/bitmap/quantile stores (each micro-batch
OVERWRITES its own ``epoch=<id>`` partial — replay-idempotent; readers
fold partials by summing; ``compact`` bounds the partial count with the
manifest-guarded base fold).  The read paths then run the EXACT batch
computations — ``holt_forecast_over`` / ``seasonal_decompose_over`` are
the same functions the registry queries call — over the merged series,
so stream == batch is equality of code paths, not a reimplementation.

Numeric note: partials store the RAW double sum per day; the house
integer-cents quantization (``round(sum * 100)``) happens once at read
time over the merged total, same as the batch query.  Summing partials
associates float additions differently than one batch sum, but the
cents rounding absorbs association error (~1 ulp of the day total) —
the identical tolerance the batch query already relies on across
engines.

Scale notes: the per-batch delta is a map-side-combined shuffle of
|days touched by the batch| rows; total state is one row per day per
partial — metadata-sized forever.  The recursion/window stages at read
time are day-cardinality regardless of corpus size, which is the
100 TB rule for sequential math here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .epoch_store import EpochStore

__all__ = ["StreamingForecastState"]


class StreamingForecastState:
    """(day -> revenue partial sum) state; Holt level/trend forecasts
    and seasonal decompositions read off the merged daily series."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        ts_col: str = "ts",
        value_col: str = "value",
        checkpoint: str | None = None,
    ):
        self.spark = spark
        self.ts_col = ts_col
        self.value_col = value_col
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._store = EpochStore(spark, out_dir, "day date, rev_d double")

    # -- write path ----------------------------------------------------------

    def start(self, stream: DataFrame, available_now: bool = False):
        writer = (
            stream.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("forecast-state")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy(
            F.to_date(F.date_trunc("day", F.col(self.ts_col))).alias("day")
        ).agg(F.sum(self.value_col).alias("rev_d"))
        self._store.write_epoch(delta, epoch_id)

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _fold(df: DataFrame) -> DataFrame:
        return (
            df.select("day", "rev_d")
            .groupBy("day")
            .agg(F.sum("rev_d").alias("rev_d"))
        )

    def read_daily(self) -> DataFrame:
        """The merged daily series, quantized to the batch queries'
        integer-cents contract: (day, rev_c)."""
        return self._fold(self._store.state_df()).select(
            "day",
            F.round(F.col("rev_d") * 100).cast("long").alias("rev_c"),
        )

    def holt_forecast(self) -> DataFrame:
        """7-day Holt forecast from the merged state — the batch
        query's own recursion (queries_r12.holt_forecast_over)."""
        from target_parquet_spark.queries_r12 import holt_forecast_over

        return holt_forecast_over(self.spark, self.read_daily())

    def seasonal_decompose(self) -> DataFrame:
        """Trend/seasonal/residual decomposition of the merged state —
        the batch query's own pipeline
        (queries_r12.seasonal_decompose_over)."""
        from target_parquet_spark.queries_r12 import seasonal_decompose_over

        return seasonal_decompose_over(self.read_daily())

    def compact(self) -> None:
        """Fold partials into ``base-v<N>`` (manifest-guarded; safe while
        the stream is live; no-op when empty)."""
        self._store.compact(self._fold)
