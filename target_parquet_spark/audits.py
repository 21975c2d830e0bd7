"""Shared audit-report builders used by both the batch query library and
the streaming stores — one definition per report shape so a batch oracle
and its incremental twin cannot drift."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_report"]


def k_anonymity_report(groups: DataFrame, count_col: str, k: int = 5) -> DataFrame:
    """Scalar k-anonymity rollup over a (quasi-identifier -> size) frame:
    group count, below-k groups, rows at re-identification risk, minimum
    group size, pass flag.  ``groups`` is any frame with one row per QI
    group and its size in ``count_col`` — raw-event aggregates
    (``audit_k_anonymity``) and the streaming rollup's merged state
    (``StreamingRollup.k_anonymity``) both qualify.

    The flag column is named ``k{k}_satisfied``: the oracle-pinned batch
    audit runs at k=5 (``k5_satisfied``); callers choosing another k get
    a correspondingly-named column and own that schema.
    """
    n = F.col(count_col)
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.count(F.when(n < k, 1)).cast("long").alias("n_violating"),
        F.coalesce(F.sum(F.when(n < k, n)), F.lit(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min(n).cast("long").alias("min_group_size"),
        F.when(F.min(n) >= k, 1)
        .otherwise(0)
        .cast("int")
        .alias(f"k{k}_satisfied"),
    )
