"""Event-time window operators — work on BOTH batch and streaming frames.

Absent category in the reference (SURVEY §2.10: no streaming windows /
watermarks / session state).  Each helper is a plain DataFrame transform:
applied to a batch frame it is an ordinary groupBy (and is oracle-checked
against DuckDB via the query registry); applied to a streaming frame with
``watermark=`` it becomes an incremental stateful aggregation whose state
store is bounded by the watermark.

Scale notes: tumbling/sliding windows shuffle once on (window, keys) with
partial aggregation map-side; session windows shuffle on the session keys.
The sliding window multiplies each row into duration/slide windows before
the shuffle — keep that ratio small at 100 TB (2 here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "streaming_dedup",
    "ohlc_bars",
]


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark else df


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 day",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Per-(window, keys) count + value sum over fixed tumbling windows."""
    g = _maybe_watermark(events, ts_col, watermark).groupBy(
        F.window(F.col(ts_col), duration).alias("w"), *keys
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(F.col("w.start").alias("window_start"), *keys, "n_events", "total_value")


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    g = _maybe_watermark(events, ts_col, watermark).groupBy(
        F.window(F.col(ts_col), duration, slide).alias("w"), *keys
    )
    return g.agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("w.start").alias("window_start"), *keys, "n_events"
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows per key: a session extends while events
    arrive within ``gap`` of the previous one (dynamic, unlike tumbling).
    Streaming: ``session_window`` merges partial sessions across
    micro-batches; state evicts at the watermark."""
    g = _maybe_watermark(events, ts_col, watermark).groupBy(
        F.col(key), F.session_window(F.col(ts_col), gap).alias("s")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        key,
        F.col("s.start").alias("session_start"),
        "n_events",
        "total_value",
    )


def ohlc_bars(
    events: DataFrame,
    duration: str = "1 day",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """OHLC resample over tumbling event-time windows — the streaming twin
    of the ``events_ohlc_bars`` registry query (same tie-proof zero-padded
    (epoch-us, event_id) ordering key).  min_by/max_by are declarative
    aggregates, so the same expression is an incremental stateful agg on a
    stream and a map-side-combinable groupBy on a batch frame."""
    ord_key = F.concat(
        F.lpad(F.unix_micros(F.col(ts_col)).cast("string"), 16, "0"),
        F.lpad(F.col("event_id").cast("string"), 8, "0"),
    )
    g = (
        _maybe_watermark(events, ts_col, watermark)
        .withColumn("_ord", ord_key)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
    )
    return g.agg(
        F.min_by("value", "_ord").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "_ord").alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.round(F.sum("value"), 2).alias("turnover"),
    ).select(F.col("w.start").alias("window_start"), *keys, "open", "high", "low", "close", "volume", "turnover")


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Exactly-once-by-key over a stream: ``dropDuplicates`` backed by a
    watermark-bounded state store (without the watermark the key set grows
    forever — never ship that at 100 TB).  Batch frames get the plain
    hash-aggregate dedup."""
    if df.isStreaming and watermark:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
