"""Incrementally-maintained count-min heavy hitters (streaming twin of
``agg_heavy_hitters_cms`` in queries_r2.py).

The batch query proved the state — a d x w register table
(j, bucket) -> count — merges by plain addition; here that state is
maintained over a stream with the same EpochStore protocol as the
rollup / bitmap-distinct / quantile stores: each micro-batch OVERWRITES
its own ``epoch=<id>`` partial (replay-idempotent without a
transactional table format), readers fold partials by summing, and
``compact`` bounds the partial count via the manifest-guarded
``base-v<N>`` fold.

CMS registers alone cannot ENUMERATE heavy hitters (they answer point
queries), so the store keeps a second, set-mergeable piece of state: the
per-batch candidate keys (every key whose in-batch count reaches
``candidate_min``, capped at the ``max_candidates`` most frequent).
``heavy_hitters()`` point-queries the merged registers for each merged
candidate — the classical sketch+candidate-heap pairing, re-expressed as
two epoch-partial folds.  The candidate set is a RECALL HEURISTIC (the
standard one): a key can in principle stay under ``candidate_min`` in
every batch yet be globally heavy; callers needing a hard guarantee set
``candidate_min=1`` (candidates then cover every key ever seen and only
``max_candidates`` bounds state — at 100 TB, per-key state is what the
sketch exists to avoid, so the cap is the point).

Scale notes: the register delta is a map-side-combined aggregate into a
fixed d*w-row state per batch (1024 rows here) regardless of batch
size; the candidate delta is top-``max_candidates`` per batch.  Folding
is a sum (registers) and a distinct (candidates) over a few thousand
rows — driver-light, executor-cheap, and bit-deterministic (md5
bucketing, no builtin sketch UDAF state).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .epoch_store import EpochStore

__all__ = ["StreamingHeavyHitters"]


class StreamingHeavyHitters:
    """d x w count-min registers + candidate keys, incrementally
    maintained; heavy-hitter estimates read off the merged state."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        key_col: str = "token",
        candidate_min: int = 2,
        max_candidates: int = 256,
        checkpoint: str | None = None,
    ):
        self.spark = spark
        self.key_col = key_col
        self.candidate_min = int(candidate_min)
        self.max_candidates = int(max_candidates)
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._registers = EpochStore(
            spark, os.path.join(out_dir, "registers"), "j int, b bigint, n bigint"
        )
        self._candidates = EpochStore(
            spark, os.path.join(out_dir, "candidates"), "key string"
        )

    # -- write path ----------------------------------------------------------

    def start(self, stream: DataFrame, available_now: bool = False):
        writer = (
            stream.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("heavy-hitters")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _buckets(self, key: Column) -> Column:
        from target_parquet_spark.queries_r2 import _CMS_D, _cms_bucket

        return F.array(*[_cms_bucket(j, key) for j in range(_CMS_D)])

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        keyed = batch_df.select(
            F.col(self.key_col).cast("string").alias("key")
        ).filter(F.col("key").isNotNull())
        counts = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
        # both epoch writes consume the same per-key aggregate: persist it
        # so the micro-batch input is scanned/aggregated once, not twice
        # (same pattern as env.persist() in singer_stream._process_batch)
        counts.persist()
        try:
            self._write_deltas(counts, epoch_id)
        finally:
            counts.unpersist()

    def _write_deltas(self, counts: DataFrame, epoch_id: int) -> None:
        # registers: per-key counts exploded across the d hash rows, then
        # folded into the fixed d*w state — two map-combinable aggregates,
        # nothing proportional to batch size leaves the executors
        reg = (
            counts.select(
                "c", F.posexplode(self._buckets(F.col("key"))).alias("j", "b")
            )
            .groupBy("j", "b")
            .agg(F.sum("c").alias("n"))
            .select(F.col("j").cast("int"), "b", "n")
        )
        self._registers.write_epoch(reg, epoch_id)
        cand = (
            counts.filter(F.col("c") >= self.candidate_min)
            .orderBy(F.desc("c"), "key")
            .limit(self.max_candidates)
            .select("key")
        )
        self._candidates.write_epoch(cand, epoch_id)

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _fold_registers(df: DataFrame) -> DataFrame:
        return (
            df.select("j", "b", "n").groupBy("j", "b").agg(F.sum("n").alias("n"))
        )

    @staticmethod
    def _fold_candidates(df: DataFrame) -> DataFrame:
        return df.select("key").distinct()

    def registers(self) -> DataFrame:
        """The merged register table: (j, b, n) — identical to the batch
        sketch built over the concatenation of all batches."""
        return self._fold_registers(self._registers.state_df())

    def candidates(self) -> DataFrame:
        return self._fold_candidates(self._candidates.state_df())

    def heavy_hitters(self, min_est: int = 1, top: int = 20) -> DataFrame:
        """Candidates point-queried against the merged registers:
        (key, cms_est), est = min over the d rows (never undercounts),
        filtered to ``min_est`` and top-``top`` by (est desc, key)."""
        probes = self.candidates().select(
            "key", F.posexplode(self._buckets(F.col("key"))).alias("j", "b")
        )
        est = (
            probes.join(self.registers(), ["j", "b"])
            .groupBy("key")
            .agg(F.min("n").alias("cms_est"))
            .filter(F.col("cms_est") >= min_est)
        )
        return est.orderBy(F.desc("cms_est"), "key").limit(top)

    def compact(self) -> None:
        """Fold partials into ``base-v<N>`` on both stores
        (manifest-guarded; safe while the stream is live; no-op when
        empty)."""
        self._registers.compact(self._fold_registers)
        self._candidates.compact(self._fold_candidates)
