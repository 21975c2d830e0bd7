"""Streaming ANN ingest: a cell-partitioned vector store maintained
from an embedding stream.

The batch story (``queries_r6.scan_ivf_partitioned``) materializes the
"IVF cell = partition key" layout once; this module keeps that layout
CURRENT as new vectors arrive — the missing half of a production ANN
index, where the corpus grows continuously and queries must see fresh
vectors without a rebuild.  The reference has no streaming surface at
all (SURVEY.md §2.10); this extends the engine's epoch-directory
protocol family (``streaming/epoch_store.py``) to raw row appends.

Exactly-once on plain parquet: each micro-batch writes its rows under
``batch=<batchId>/cell=<cell>/`` with ``mode('overwrite')`` scoped to
its OWN batch directory — a replay (crash between write and checkpoint
commit) rewrites the identical rows in place and never touches other
batches.  Unlike the aggregate stores, no merge/compaction arithmetic
is needed: rows are immutable facts, the store is just a growing
partitioned table.

Scale notes: assignment is the same literal-argmax Column expression as
the batch path (zero shuffle, zero join — the codebook is a plan
literal); the write's only cost is the partitioned append.  Queries
prune on the cell partition column (directory-level, before file I/O),
so a query touches nprobe/n_centroids of every batch's files.

Compaction is deliberately NOT implemented here: folding ``batch=``
directories into larger per-cell files while a stream appends and
readers list directories needs the manifest-guarded protocol
``streaming/epoch_store.py`` implements for the aggregate stores (a
naive rewrite-then-delete lets a racing reader double-read or miss
rows — the exact bug class the r2 advisory flagged in the bitmap
store).  Reads stay correct without it; file-count growth is the only
cost, bounded by batch cadence.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from target_parquet_spark.operators import similarity as S

__all__ = ["StreamingVectorStore"]


class StreamingVectorStore:
    """Cell-partitioned (IVF) vector store fed by a stream of
    (vec_id, embedding) rows."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        codebook: list[tuple[int, list[float], float]],
        checkpoint: str | None = None,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.codebook = codebook
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self.vec_col = vec_col
        self.id_col = id_col

    # -- write path ---------------------------------------------------

    def _write_batch(self, df: DataFrame, batch_id: int) -> None:
        """Assign cells and append under batch=<id>/ (overwrite scoped
        to this batch's directory -> replay-idempotent)."""
        (
            df.withColumn(
                "cell", S.ivf_cell(F.col(self.vec_col), self.codebook)
            )
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(self.out_dir, f"batch={batch_id}"))
        )

    def start(self, stream: DataFrame):
        """Attach to a streaming DataFrame of (id, vector) rows."""
        return (
            stream.writeStream.foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- read path ----------------------------------------------------

    def _batch_dirs(self) -> list[str]:
        if not os.path.isdir(self.out_dir):
            return []
        return [
            d
            for d in os.listdir(self.out_dir)
            if d.startswith("batch=")
        ]

    def vectors(self) -> DataFrame:
        """The stored corpus with its cell assignment (partition
        discovery exposes ``batch`` and ``cell`` as columns).

        Raises a descriptive error before the first micro-batch commits
        (the bare parquet glob would otherwise surface an opaque
        'path does not exist' AnalysisException from the read path)."""
        if not self._batch_dirs():
            raise ValueError(
                f"StreamingVectorStore at {self.out_dir} holds no "
                "committed batches yet — start() a stream (or check the "
                "source produced data) before querying"
            )
        return self.spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "batch=*")
        )

    def ann_query(
        self,
        query_vec: list[float],
        nprobe: int = 2,
        threshold: float = 0.1,
    ) -> DataFrame:
        """Exact cosine over the probed cells only — the cell filter is
        a directory-level PartitionFilters prune, so vectors outside the
        probed cells are never read."""
        qv = [float(x) for x in query_vec]
        probe = S.ivf_probe_cells(qv, self.codebook, nprobe)
        qnorm = math.sqrt(sum(x * x for x in qv))
        qlit = F.array(*[F.lit(x) for x in qv])
        return (
            self.vectors()
            .filter(F.col("cell").isin(probe))
            .select(
                F.col(self.id_col),
                F.col("cell"),
                F.round(
                    S.dot(F.col(self.vec_col), qlit)
                    / (S.norm(F.col(self.vec_col)) * F.lit(qnorm)),
                    4,
                ).alias("sim"),
            )
            .filter(F.col("sim") >= threshold)
        )
