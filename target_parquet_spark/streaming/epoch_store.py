"""Shared epoch-directory state store for incrementally-maintained
streaming aggregates (``streaming/rollup.py``, ``streaming/distinct.py``).

Protocol
--------
Each micro-batch OVERWRITES its own ``epoch=<batchId>`` partial, so a
replay after a crash rewrites an identical partial (idempotent) and
never touches other epochs.  Readers fold all epoch partials plus at
most one compacted ``base-v<N>`` directory.

Why a separate ``base-v<N>`` namespace: writing compacted state into
``epoch=<max+1>`` collides with the batchId the streaming checkpoint
will assign to the NEXT micro-batch — that batch's ``mode("overwrite")``
would then silently replace the entire compacted history with a single
batch's delta.  Base versions can never collide with a batchId.

Compaction folds a SNAPSHOT of (latest base + epochs listed at entry)
into ``base-v<N+1>``:

1. parquet is written to a ``_tmp-base-v<N+1>`` staging dir,
2. the folded dir names are recorded in ``_folded.json`` inside it,
3. the staging dir is atomically renamed to ``base-v<N+1>``,
4. only then are the snapshotted source dirs removed.

Epochs that land AFTER the snapshot was listed are neither folded nor
deleted — they stay and merge on read.  A reader racing the compaction
either sees the old layout, or the new base plus not-yet-deleted source
dirs; the manifest lets it exclude exactly the epochs the base already
contains, so totals never double-count (load-bearing for non-idempotent
folds like sums).  A reader that listed dirs just before they were
removed can hit FileNotFound and should retry — the standard contract
for non-transactional parquet stores.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["EpochStore"]

_MANIFEST = "_folded.json"


class EpochStore:
    """Epoch-partial parquet state with collision-proof compaction."""

    def __init__(self, spark: SparkSession, out_dir: str, empty_schema: str):
        self.spark = spark
        self.out_dir = out_dir
        self.empty_schema = empty_schema

    # -- write path ----------------------------------------------------------

    def write_epoch(self, delta: DataFrame, epoch_id: int) -> None:
        """Overwrite this epoch's partial only (replay-idempotent)."""
        delta.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={int(epoch_id)}")
        )

    # -- listing -------------------------------------------------------------

    def _list(self) -> tuple[list[str], list[str]]:
        """(base dirs sorted by version, epoch dirs) currently present."""
        if not os.path.isdir(self.out_dir):
            return [], []
        names = os.listdir(self.out_dir)
        bases = sorted(
            (d for d in names if d.startswith("base-v")),
            key=lambda d: int(d.split("-v", 1)[1]),
        )
        epochs = [d for d in names if d.startswith("epoch=")]
        return bases, epochs

    def _manifest(self, base: str) -> list[str]:
        p = os.path.join(self.out_dir, base, _MANIFEST)
        try:
            with open(p) as f:
                return json.load(f)
        except OSError:
            return []

    def _committed(self, d: str) -> bool:
        """True when the dir's write job has committed (``_SUCCESS``
        present).  A dir mid-write holds only ``_temporary`` content —
        zero readable files — so folding it would record it as empty and
        a read across only such dirs cannot even infer a schema."""
        return os.path.isfile(os.path.join(self.out_dir, d, "_SUCCESS"))

    # -- read path -----------------------------------------------------------

    def state_df(self) -> DataFrame:
        """Union of the latest base + epoch partials the base does not
        already contain.  Caller applies its fold (sum / bit_or / ...)."""
        bases, epochs = self._list()
        paths: list[str] = []
        folded: set[str] = set()
        if bases:
            latest = bases[-1]
            folded = set(self._manifest(latest))
            paths.append(os.path.join(self.out_dir, latest))
        # only committed epochs: a dir that is mid-write has zero readable
        # files, and a read spanning only such dirs fails schema inference
        paths += [
            os.path.join(self.out_dir, e)
            for e in epochs
            if e not in folded and self._committed(e)
        ]
        if not paths:
            return self.spark.createDataFrame([], self.empty_schema)
        return self.spark.read.parquet(*paths)

    def split_state(self):
        """(base_df | None, unfolded_epochs_df | None, base_name | None)
        — the same dirs :meth:`state_df` would union, kept separate so a
        reader with a base-keyed sidecar (e.g. the sequential monitor's
        moments table, r10) can delta-adjust instead of re-folding the
        whole state."""
        bases, epochs = self._list()
        base_df = base_name = None
        folded: set[str] = set()
        if bases:
            base_name = bases[-1]
            folded = set(self._manifest(base_name))
            base_df = self.spark.read.parquet(
                os.path.join(self.out_dir, base_name)
            )
        delta_paths = [
            os.path.join(self.out_dir, e)
            for e in epochs
            if e not in folded and self._committed(e)
        ]
        delta_df = (
            self.spark.read.parquet(*delta_paths) if delta_paths else None
        )
        return base_df, delta_df, base_name

    # -- compaction ----------------------------------------------------------

    def compact(self, fold: Callable[[DataFrame], DataFrame]) -> None:
        """Fold current state into one fresh base version; no-op when
        there is nothing to fold (zero epochs and at most one base)."""
        bases, epochs = self._list()
        # clear staging dirs left by a crashed previous compaction
        for d in os.listdir(self.out_dir) if os.path.isdir(self.out_dir) else []:
            if d.startswith("_tmp-base-v"):
                shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)
        if not epochs and len(bases) <= 1:
            return
        folded_already = set(self._manifest(bases[-1])) if bases else set()
        # Fold only COMMITTED epochs: an epoch whose write is in flight
        # (data still under _temporary, no _SUCCESS marker) reads as zero
        # rows — folding it would record the epoch in the manifest and
        # delete it, excluding the batch's data FOREVER once the writer
        # commits.  Uncommitted epochs stay for the next compaction.
        snapshot = [
            e
            for e in epochs
            if e not in folded_already and self._committed(e)
        ]
        src = ([bases[-1]] if bases else []) + snapshot
        if not snapshot and len(bases) <= 1:
            # every present epoch is still mid-write (or already folded
            # and awaiting delete) and there is no stale base to retire —
            # nothing to fold; stay a no-op as the docstring promises
            # for live streams (src may even be empty, which would fail
            # schema inference below)
            return
        merged = fold(
            self.spark.read.parquet(
                *[os.path.join(self.out_dir, d) for d in src]
            )
        )
        next_v = 1 + (int(bases[-1].split("-v", 1)[1]) if bases else 0)
        tmp = os.path.join(self.out_dir, f"_tmp-base-v{next_v}")
        merged.write.mode("overwrite").parquet(tmp)
        # The manifest carries FORWARD the previous base's exclusions: an
        # already-folded epoch dir can re-materialize at any time (a replay
        # overwrites blindly, or the delete below raced a crash), and once
        # its content is inside any base it must stay excluded forever —
        # a manifest listing only this round's snapshot would re-admit it
        # after the next compaction and silently double-count sums.
        with open(os.path.join(tmp, _MANIFEST), "w") as f:
            json.dump(sorted(folded_already | set(snapshot)), f)
        os.rename(tmp, os.path.join(self.out_dir, f"base-v{next_v}"))
        stale = [e for e in epochs if e in folded_already]
        for d in bases + snapshot + stale:
            shutil.rmtree(os.path.join(self.out_dir, d), ignore_errors=True)
