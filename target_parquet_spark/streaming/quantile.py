"""Incrementally-maintained mergeable quantile sketch (streaming twin of
``agg_hdr_quantile_sketch`` in queries_r4.py).

The batch query proved the state — (key, log-bin) -> count — merges by
plain addition; here that state is maintained over a stream with the
same EpochStore protocol as the rollup and bitmap-distinct stores: each
micro-batch OVERWRITES its own ``epoch=<id>`` partial (replay-idempotent
without a transactional table format), readers fold partials by summing,
and ``compact`` bounds the partial count via the manifest-guarded
``base-v<N>`` fold (sums are not idempotent — the manifest prevents
double counting, exactly as in streaming/rollup.py).

This closes the percentile gap in the streaming-summary family: the
rollup streams sums/counts, the bitmap store streams exact distincts,
this streams p50/p90/p99 with a half-bin (~5%) relative error bound —
the latency dashboard fed by epoch partials instead of rescans.

Scale notes: the per-batch delta is a map-side-combined shuffle whose
cardinality is |keys| x |occupied log bins| (a few hundred rows for any
realistic value range — the bin index is logarithmic in the range).
Non-positive values cannot be log-binned and are counted separately in
the ``bin = NULL`` row so the sketch still accounts for every record.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .epoch_store import EpochStore

__all__ = ["StreamingQuantileSketch"]


class StreamingQuantileSketch:
    """(key, hdr_bin(value)) -> count sketch, incrementally maintained;
    quantile estimates read off the merged CDF."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        key_col: str = "event_type",
        value_col: str = "value",
        checkpoint: str | None = None,
    ):
        self.spark = spark
        self.key_col = key_col
        self.value_col = value_col
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._store = EpochStore(
            spark, out_dir, "key string, bin bigint, n bigint"
        )

    # -- write path ----------------------------------------------------------

    def start(self, stream: DataFrame, available_now: bool = False):
        writer = (
            stream.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("quantile-sketch")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from target_parquet_spark.queries_r4 import hdr_bin

        v = F.col(self.value_col)
        delta = batch_df.groupBy(
            F.col(self.key_col).cast("string").alias("key"),
            F.when(v > 0, hdr_bin(v)).alias("bin"),  # NULL = non-positive
        ).agg(F.count(F.lit(1)).alias("n"))
        self._store.write_epoch(delta, epoch_id)

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _fold(df: DataFrame) -> DataFrame:
        return (
            df.select("key", "bin", "n")
            .groupBy("key", "bin")
            .agg(F.sum("n").alias("n"))
        )

    def read(self) -> DataFrame:
        """The merged sketch state: (key, bin, n)."""
        return self._fold(self._store.state_df())

    def quantiles(self, qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
        """Per-key quantile estimates from the merged CDF — identical math
        to the batch query's estimate stage (bin geometric midpoint at the
        first bin whose cumulative count crosses q * total).  Non-positive
        values (bin NULL) are excluded from the CDF but reported."""
        from pyspark.sql import Window

        s = self.read()
        pos = s.filter(F.col("bin").isNotNull())
        part = Window.partitionBy("key")
        w = (
            pos.withColumn("cum", F.sum("n").over(part.orderBy("bin")))
            .withColumn("total", F.sum("n").over(part))
            .withColumn(
                "rep", F.round(F.pow(F.lit(1.1), F.col("bin") + 0.5), 4)
            )
        )
        est = w.groupBy("key").agg(
            F.max("total").cast("long").alias("n"),
            *[
                F.round(
                    F.min(
                        F.when(
                            F.col("cum") >= q * F.col("total"), F.col("rep")
                        )
                    ),
                    4,
                ).alias(f"est_p{int(q * 100)}")
                for q in qs
            ],
        )
        nonpos = (
            s.filter(F.col("bin").isNull())
            .groupBy("key")
            .agg(F.sum("n").cast("long").alias("n_nonpositive"))
        )
        # full outer: a key whose values are ALL non-positive has no
        # estimate rows but must still be reported (review finding — the
        # left join silently dropped it)
        return (
            est.join(nonpos, "key", "full")
            .na.fill({"n_nonpositive": 0, "n": 0})
        )

    def compact(self) -> None:
        """Fold partials into ``base-v<N>`` (manifest-guarded; safe while
        the stream is live; no-op when empty)."""
        self._store.compact(self._fold)
