"""Lineage truncation for reused small intermediates.

Round-10 plan audit: every query that referenced a derived table more
than once was *re-executing its whole pipeline per reference*, because
Spark plans each DataFrame reference as an independent subtree and the
exchanges never matched up for reuse (``.explain`` read 0 ReusedExchange
across the 50 captured plans; ``graph_link_prediction`` re-ran the
bucketed kNN self-join 9 times — 40 parquet scans — and the beam-search
loop in ``graph_ann_search`` doubled its lineage every hop: 144 scans
after 3 hops).

``mat()`` is the fix the optimization guide prescribes for exactly this
("materialising an intermediate result ... truncates the plan", §3.3;
`localCheckpoint` §5): compile the subtree once, compute it once on
first use, and hand every consumer a `LogicalRDD` scan of the stored
blocks.  Values are bit-identical — the same deterministic plan runs,
just once instead of N times.

Scale posture — two classes of cut site:

- **Model/edge-sized** (kNN edge lists, symmetrized graphs, frontier
  beams, centroid ranks — thousands to low millions of rows): safe to
  localCheckpoint at any scale; these are exactly the intermediates a
  production pipeline writes out as artifacts (the repo's
  knn_edge_artifact does so explicitly).
- **Corpus-sized** (the r10 LM-family cuts in queries_r3/r8/r9:
  per-doc token arrays, vocab-weighted doc tables, deflated embedding
  tables — one row per document/vector).  Locally these are small and
  the cut is a clear win (the pipeline above them re-ran 3-5x per
  query).  At 100 TB a localCheckpoint of a corpus-sized table pins
  roughly the full derived corpus in NON-fault-tolerant executor
  MEMORY_AND_DISK storage: a lost executor kills the job (the lineage
  is gone).  On a real cluster either set
  ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` (routes these cuts through
  replayable reliable checkpoints — same semantics, survives executor
  loss) or accept the recompute and skip the cut
  (``SPARK_GRAFT_NO_MAT=1``); the env knobs exist precisely so this is
  a deploy-time decision, not a code change.

Local checkpoints live in executor storage (MEMORY_AND_DISK) and die
with the session — nothing is persisted across runs, and every
invocation recomputes from the parquet inputs.

On a real cluster note: `localCheckpoint` trades fault-tolerance for
speed (a lost executor loses its blocks and the lineage is gone).  For
a long 100 TB job, flip the reliable flag below to route through
`spark.sparkContext.setCheckpointDir` + `checkpoint()` instead — same
semantics, replayable blocks.

Relationship to ``operators.dedup.lineage_cut``: that helper is the
EAGER twin used inside convergence loops (each round's cut is computed
before the round's fixpoint action reads it — the job boundary is the
point).  ``mat`` is lazy: construction stays job-free, so EXPLAIN-only
paths (scripts/explain.py, catalog listings) never execute a scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Scale-dependent knob (conf/env, local default): reliable checkpoints
#: require a checkpoint dir and an extra write+read, worth it only when
#: executor loss is a real event (cluster), never in local mode.
_RELIABLE = os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT", "") == "1"


def mat(df: DataFrame) -> DataFrame:
    """Materialize a reused intermediate: compute once, scan many times.

    Lazy (`eager=False`): the plan is compiled now, the blocks are
    computed by the first action that touches the result — construction
    stays job-free, matching the bench's timed region.

    ``SPARK_GRAFT_NO_MAT=1`` (read at call time) bypasses the cut and
    returns ``df`` unchanged: a checkpoint replaces the subtree with a
    ``LogicalRDD`` scan in ``explain`` output, so plan-shape tests and
    plan-capture tooling set this to see the full algebra they assert
    on.  Execution semantics are identical either way — the cut only
    controls compute-once-vs-replay, never values.
    """
    if os.environ.get("SPARK_GRAFT_NO_MAT", "") == "1":
        return df
    if _RELIABLE:
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)
