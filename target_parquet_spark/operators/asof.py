"""As-of and range joins — operators Spark lacks natively (SURVEY §2.10).

As-of join (``left`` row matched to the latest ``right`` row with
``right.ts <= left.ts`` per key) via the union+window technique:

    tag both sides -> union -> window per key ordered by (ts, side) ->
    last_value(right cols, ignorenulls) -> keep left rows

One shuffle on the key (the same shuffle a sort-merge join would pay), no
per-key Python, no ``collect`` — scales to arbitrarily many keys and is
skew-tolerant under AQE.  This beats the per-group ``pd.merge_asof``
approach (no Arrow transfer, no group materialization).

Range join: equi-join on a coarse bucket of the range key + residual
filter, turning an O(n*m) theta join into a banded equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "1 hour",
    strict_after: bool = True,
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    suffix: str = "_right",
    how: str = "inner",
) -> DataFrame:
    """Time-interval equi-join: each left row pairs with same-key right
    rows whose timestamp falls in ``(left_ts, left_ts + upper]`` (closed
    at the left end instead when ``strict_after=False``).  Right columns
    come back suffixed.  ``how='left_outer'`` keeps band-less left rows
    null-padded (the conversion-funnel denominator); for STREAMING outer
    joins both watermarks are mandatory and rows emit only once the
    watermark passes the band.

    Batch frames: Catalyst plans the equi-key as an ordinary hash/SMJ
    join and the time band as a residual filter — one shuffle on the key.
    Streaming frames: set BOTH watermarks and this is Spark's stateful
    stream-stream inner join; the band condition is what lets each side's
    state store evict rows older than ``watermark + upper`` (without it
    state grows forever — never ship that).
    """
    if left_watermark:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark:
        right = right.withWatermark(right_ts, right_watermark)

    keep = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in keep],
    )
    lo = left[left_ts]
    rts = r[f"{right_ts}{suffix}"]
    after = rts > lo if strict_after else rts >= lo
    cond = (
        (left[on] == r[f"{on}{suffix}"])
        & after
        & (rts <= lo + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(r, cond, how).drop(f"{on}{suffix}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row at-or-before it
    (``direction='backward'``, the default) or the earliest right row
    at-or-after it (``direction='forward'`` — the time-to-next-event
    shape: next quote after a trade, next purchase after a click).

    Right rows with equal timestamps sort before left rows (a right event
    AT the left timestamp matches, like ``pd.merge_asof`` default /
    DuckDB ``ASOF JOIN`` with ``>=`` — or ``<=`` for forward).  Both
    directions are the same one-shuffle union+window plan; forward just
    traverses the per-key timeline descending.

    ``tolerance_seconds`` (pd.merge_asof's ``tolerance``): a match
    farther than this from the left timestamp is nulled out — a stale
    quote should not enrich today's trade.  The mask is a scan-stage
    projection after the window; the plan is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    # right_ts is ALWAYS appended to the carried struct (the tolerance mask
    # needs it); a caller-supplied list that also names it would produce two
    # struct fields called f"{right_ts}{suffix}" and make the field access
    # ambiguous — strip it here.
    right_cols = [c for c in right_cols if c != right_ts]

    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    # The matched right row travels as ONE struct: last(ignorenulls) must
    # skip the interleaved LEFT rows (whose struct is null) but carry the
    # matched right row ATOMICALLY — per-column carries would let a null
    # field in the matched row fall through to an OLDER row's value,
    # mixing columns from different right rows (and, under
    # tolerance_seconds, letting a beyond-tolerance value survive a mask
    # computed from the matched row's timestamp).
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ats"),
            F.struct(
                *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
                F.col(right_ts).alias(f"{right_ts}{suffix}"),
            ).alias("_rrow"),
        )
        .withColumn("_side", F.lit(0))
    )

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    order = (
        F.col("_ats").desc() if direction == "forward" else F.col("_ats").asc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(order, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = unioned.withColumn(
        "_rrow", F.last(F.col("_rrow"), ignorenulls=True).over(w)
    )
    matched = F.col("_rrow")
    if tolerance_seconds is not None:
        lts = F.col(left_ts).cast("double")
        rts = matched[f"{right_ts}{suffix}"].cast("double")
        gap = (lts - rts) if direction == "backward" else (rts - lts)
        matched = F.when(gap <= tolerance_seconds, matched)
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]
    out = unioned.filter(F.col("_side") == 1)
    for c in carried:
        out = out.withColumn(c, matched[c])
    return out.drop("_side", "_ats", "_rrow")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """left.val BETWEEN right.lo AND right.hi as a banded equi-join.

    Each right interval is exploded to the buckets it overlaps; left rows
    join on their single bucket, then the exact BETWEEN filter runs on the
    (small) banded candidate set.  Choose ``bucket_width`` ~ the median
    interval length so the explode factor stays near 1.
    """
    extra_on = extra_on or []
    lb = left.withColumn("_bucket", F.floor(F.col(left_val) / bucket_width))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    cond = [lb["_bucket"] == rb["_bucket"]] + [lb[c] == rb[c] for c in extra_on]
    joined = lb.join(rb, cond).filter(
        (lb[left_val] >= rb[right_lo]) & (lb[left_val] <= rb[right_hi])
    )
    return joined.drop(lb["_bucket"]).drop(rb["_bucket"])
