"""Streaming DSIR quality gate: score a document stream against
literal importance-resampling state trained batch-side.

The batch story (``queries_r8.sample_dsir_importance``) trains a
bounded hashed-bigram log-likelihood-ratio table (at most
``queries_r8._DSIR_B`` integer pairs) and scores the corpus with a
pure column expression.  This module is the streaming half of that
pipeline: new crawl batches arrive continuously, and each document is
scored and routed (keep / reject) the moment it lands — the admission
gate in front of a training corpus.

The whole gate is ONE stateless projection (``dsir_score_col`` — a
literal-map lookup folded over the doc's bigrams): no watermark, no
state store, no stream-static join, so it runs at full source
parallelism on any cluster size and is trivially exactly-once under
replay (same row in -> same row out).  That statelessness is the point
of training the llr table as literal state: the model rides the PLAN,
not a join.

The reference (hotgluexyz/target-parquet) has no streaming surface at
all — its closest analogue is the batch-buffered RECORD loop in
``target_parquet/sinks.py``; SURVEY.md §2.10 lists streaming as an
absent category this engine fills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["StreamingDsirGate"]


class StreamingDsirGate:
    """Score and route a (doc_id, source, text) stream with trained
    DSIR llr state.

    ``llr`` is the literal state from ``queries_r8.dsir_llr_state``;
    ``threshold_micro`` is the admission cut in integer micro-units
    (keep docs whose summed llr >= threshold).  Docs with fewer than
    two tokens carry no evidence either way and are rejected (matching
    the batch query, which excludes them from ranking).
    """

    def __init__(self, llr: list[tuple[int, int]], threshold_micro: int = 0):
        if not llr:
            raise ValueError("empty llr state — train dsir_llr_state first")
        self.llr = list(llr)
        self.threshold_micro = int(threshold_micro)

    def score(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """Append ``llr_micro`` and ``keep`` to a batch OR streaming
        frame — the expression is stateless, so the same code path
        serves both (pinned by the stream==batch equivalence test)."""
        from target_parquet_spark.operators.text import tokens
        from target_parquet_spark.queries_r8 import dsir_score_col

        scored = df.withColumn(
            "llr_micro", dsir_score_col(self.llr, F.col(text_col))
        )
        has_evidence = F.size(tokens(F.col(text_col))) >= 2
        # coalesce: a NULL text makes has_evidence NULL, and NULL AND true
        # is NULL — which would route the row to the Hive default
        # partition, escaping both keep=true and keep=false.  A no-text
        # doc is a reject, not a third state.
        return scored.withColumn(
            "keep",
            F.coalesce(
                has_evidence
                & (F.col("llr_micro") >= F.lit(self.threshold_micro)),
                F.lit(False),
            ),
        )

    def run(
        self,
        stream: DataFrame,
        out_dir: str,
        checkpoint: str,
        text_col: str = "text",
        available_now: bool = False,
    ):
        """Start the gate on a streaming frame: scored rows land under
        ``out_dir`` partitioned by ``keep`` (rejects are kept for audit
        — a curation gate that silently drops data is undebuggable).
        Plain append sink; exactly-once via the checkpoint because the
        projection is deterministic and stateless.  ``available_now``
        drains the current backlog and stops — the backfill/test mode."""
        w = (
            self.score(stream, text_col)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .partitionBy("keep")
            .outputMode("append")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()
