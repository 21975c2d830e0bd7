"""Incrementally-maintained k-NN EDGE table — the embedding-side twin
of ``streaming/components.py`` (VERDICT r6 #4).

The batch artifact (``queries_r7.knn_edge_artifact``) rebuilds the
whole edge table whenever the corpus fingerprint moves; a continuously
ingested vector corpus needs the EXPENSIVE stage — same-bucket pair
discovery + cosine scoring — maintained incrementally, with the cheap
stage — per-source top-k ranking — resolved at read time:

- per micro-batch, arriving vectors are bucketed with the SAME
  expressions as the batch path (``operators/similarity.lsh_bucket``,
  fixed 4 planes — the artifact's oracle-parity regime) and normed
  once; candidates are new-vs-corpus (the accumulated vector store)
  plus new-vs-new band joins, scored with the batch twin's exact
  rounded-cosine expression, and appended as epoch partials in BOTH
  orientations (an unordered pair is a candidate for both endpoints'
  neighbor lists);
- two epoch-partial tables accumulate on the shared ``EpochStore``
  protocol: ``vecs`` (the growing bucketed+normed corpus — the join
  state) and ``cand`` (scored candidate edges — the top-k input).
- ``edges(k)`` folds the candidate partials (one row per ordered pair;
  rediscoveries carry the identical sim) and ranks per source with the
  batch twin's exact window (sim DESC, nbr ASC tie-break) — top-k is
  NOT monotone under insertion (a later vector can displace an earlier
  neighbor), which is exactly why ranking lives at read time over the
  accumulated candidates instead of being incrementally merged.

Completeness (why no candidate is missed): a same-bucket pair (a, b)
with a ingested no later than b is discovered when b's batch runs —
a's vector row is then either in the accumulated store (earlier epoch)
or in b's own batch (new-vs-new).  Replay semantics: a replayed epoch
rewrites a byte-identical ``vecs`` partial and a ``cand`` delta that
can only GROW by true same-bucket candidates (the vector state it
joins against may have advanced); extra true candidates are folded to
one row per ordered pair and cannot change the top-k, so edges after
any replay or compaction equal the batch twin exactly — pinned by
tests/test_streaming.py.

Scale notes: the per-batch join touches |batch| x bucket-occupancy,
never |corpus|^2; the vector store is bucket-keyed (a real deployment
partitions it by bucket so the stream-static join co-locates); write
ORDER is load-bearing exactly as in components.py — the ``cand`` delta
is the only one reading accumulated state, so it commits BEFORE the
``vecs`` overwrite deletes the epoch files its lazy scan reads.  The
reference has no streaming surface at all (SURVEY.md §2.10).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from target_parquet_spark.operators import similarity as S

from .epoch_store import EpochStore

__all__ = ["StreamingKnnEdges"]


class StreamingKnnEdges:
    """k-NN edge table over a vector stream: bucketed pair discovery
    maintained incrementally, top-k resolved from the accumulated
    candidate table on read."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        checkpoint: str | None = None,
        n_planes: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ):
        self.spark = spark
        self.n_planes = n_planes
        self.vec_col = vec_col
        self.id_col = id_col
        self.checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
        self._vecs = EpochStore(
            spark,
            os.path.join(out_dir, "vecs"),
            "vec_id bigint, embedding array<double>, bucket string,"
            " nrm double",
        )
        self._cand = EpochStore(
            spark,
            os.path.join(out_dir, "cand"),
            "src bigint, nbr bigint, sim double",
        )

    # -- write path ----------------------------------------------------------

    def start(self, vectors: DataFrame, available_now: bool = False):
        writer = (
            vectors.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint)
            .queryName("knn-edges")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _bucketed(self, df: DataFrame) -> DataFrame:
        """Bucket + norm with the batch path's exact expressions
        (queries_r6._knn_edges) — stream==batch equality depends on the
        sims being bit-identical."""
        v = F.col(self.vec_col)
        return df.select(
            F.col(self.id_col).alias("vec_id"),
            # stored as double: bit-identical to the batch path, which
            # casts each element to double inside the dot fold anyway,
            # and keeps the store schema stable across float sources
            v.cast("array<double>").alias("embedding"),
            S.lsh_bucket(v, n_planes=self.n_planes).alias("bucket"),
            F.sqrt(S.dot(v, v)).alias("nrm"),
        )

    @staticmethod
    def _score(pairs: DataFrame) -> DataFrame:
        """Both orientations of each discovered pair, scored once with
        the batch twin's rounded cosine (IEEE multiply is commutative,
        so one score serves both directions bit-exactly)."""
        scored = pairs.select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.round(
                S.dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                4,
            ).alias("sim"),
        )
        fwd = scored.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("nbr"), "sim"
        )
        rev = scored.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("nbr"), "sim"
        )
        return fwd.unionByName(rev)

    def _merge_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # persist: the bucketed batch feeds both candidate joins plus
        # its own epoch write — micro-batch sized, bounded by
        # construction (the components.py lesson)
        new = self._bucketed(batch_df).persist()
        n = new.alias("n")
        state = self._vecs.state_df().alias("c")
        vs_corpus = n.join(
            state,
            (F.col("n.bucket") == F.col("c.bucket"))
            & (F.col("n.vec_id") != F.col("c.vec_id")),
        ).select(
            F.col("n.vec_id").alias("_ida"),
            F.col("c.vec_id").alias("_idb"),
            F.col("n.embedding").alias("_va"),
            F.col("c.embedding").alias("_vb"),
            F.col("n.nrm").alias("_na"),
            F.col("c.nrm").alias("_nb"),
        )
        m = new.alias("m")
        vs_new = n.join(
            m,
            (F.col("n.bucket") == F.col("m.bucket"))
            & (F.col("n.vec_id") < F.col("m.vec_id")),
        ).select(
            F.col("n.vec_id").alias("_ida"),
            F.col("m.vec_id").alias("_idb"),
            F.col("n.embedding").alias("_va"),
            F.col("m.embedding").alias("_vb"),
            F.col("n.nrm").alias("_na"),
            F.col("m.nrm").alias("_nb"),
        )
        cand = self._score(vs_corpus).unionByName(self._score(vs_new))
        # write ORDER is load-bearing (components.py): cand reads the
        # accumulated vecs state lazily — commit it before the vecs
        # overwrite can delete a replayed epoch's files mid-scan
        try:
            self._cand.write_epoch(cand, epoch_id)
            self._vecs.write_epoch(new, epoch_id)
        finally:
            new.unpersist()

    # -- folds ---------------------------------------------------------------

    @staticmethod
    def _fold_vecs(df: DataFrame) -> DataFrame:
        return df.dropDuplicates(["vec_id"])

    @staticmethod
    def _fold_cand(df: DataFrame) -> DataFrame:
        # a rediscovered pair carries the identical sim (same vectors,
        # same fold); max is the idempotent fold spelling
        return (
            df.select("src", "nbr", "sim")
            .groupBy("src", "nbr")
            .agg(F.max("sim").alias("sim"))
        )

    # -- read path -----------------------------------------------------------

    def candidates(self) -> DataFrame:
        """Folded scored candidates: one (src, nbr, sim) row per
        ordered same-bucket pair discovered so far."""
        return self._fold_cand(self._cand.state_df())

    def edges(self, k: int = 3) -> DataFrame:
        """The k-NN edge table (src, nbr_rank, nbr, sim) — identical to
        the batch ``_knn_edges`` over the same corpus: same sims, same
        (sim DESC, nbr ASC) ranking window, same top-k cut."""
        w = Window.partitionBy("src").orderBy(
            F.col("sim").desc(), F.col("nbr")
        )
        return (
            self.candidates()
            .withColumn("nbr_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("nbr_rank") <= k)
            .select("src", "nbr_rank", "nbr", "sim")
        )

    def compact(self) -> None:
        """Fold both stores' partials into one ``base-v<N>``; safe
        while the stream is live (see epoch_store docstring)."""
        self._vecs.compact(self._fold_vecs)
        self._cand.compact(self._fold_cand)
