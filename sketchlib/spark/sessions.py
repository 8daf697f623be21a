"""Gap-based sessionization over conversation/event streams.

The transcripts data model (conv_id, turn_idx, ts) and the reference's
time-decay rule (src/tdbloom.c: "fresh within timeout") both revolve around
the same notion — activity separated by more than a gap belongs to a new
episode.  This module makes the episode itself a first-class operator:

- :func:`sessionize` — assign a per-key 1-based session index with the
  classic lag/cumulative-sum construction, pure Catalyst (one shuffle on
  the key, two window functions over the same partitioning — Spark plans a
  single sort+exchange, whole-stage codegen end-to-end).
- :func:`session_stats` — one row per (key, session): bounds and size.
- :func:`session_windows_stream` — the streaming equivalent via Spark's
  built-in ``session_window`` with a watermark (merging gap windows,
  state bounded by the watermark horizon).

Tie-safety: rows at the SAME timestamp always land in the same session
(gap 0 ≤ any threshold), so session assignment and every aggregate here
are deterministic even though the within-tie sort order is not.

At 100 TB the only shuffle is the hash partition on ``key``; per-key data
is streamed through a sort-based window (spillable), so a hot key degrades
to one task's disk sort, never a driver problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str | Column,
    ts: str = "ts",
    gap_sec: int = 1800,
    out_col: str = "session_seq",
) -> DataFrame:
    """Add ``out_col``: the 1-based session index per key, where a new
    session starts when the gap from the previous row (by event time)
    exceeds ``gap_sec`` seconds."""
    key_col = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(key_col).orderBy(F.col(ts))
    sec = F.unix_timestamp(F.col(ts))
    new_sess = F.when(
        F.lag(sec).over(w).isNull() | (sec - F.lag(sec).over(w) > gap_sec), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(F.col(ts)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """One row per (key, session_seq): start/end timestamps, event count,
    and active duration in seconds."""
    s = sessionize(df, key, ts=ts, gap_sec=gap_sec)
    return s.groupBy(key, "session_seq").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(F.unix_timestamp(ts)) - F.min(F.unix_timestamp(ts))).alias(
            "active_sec"
        ),
    )


def session_windows_stream(
    stream: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization: Spark's merging ``session_window`` —
    windows extend/merge while events keep arriving within ``gap`` and
    finalize once the watermark passes; state is bounded by the watermark
    horizon (late rows beyond it are dropped, the documented trade)."""
    prepared = stream.withColumn(ts, F.col(ts).cast("timestamp_ltz"))
    return (
        prepared.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("win"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key,
            "n_events",
        )
    )
