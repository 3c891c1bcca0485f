"""Windowed accumulate columns for Structured Streaming.

Reference mapping (SURVEY.md §2.10 / §2.5):
- tumbling window  = range table + project-to-range + accu
  (``TableDefinitionRange.java`` + ``ColumnDefinitionProj`` + ``Accu``)
  → ``F.window(ts, size)`` grouped aggregate,
- sliding window   = roll column / FIFO retention + accu
  (``ColumnDefinitionRoll.java`` / ``ActionRemove`` + ``Accu``)
  → ``F.window(ts, size, slide)``,
- session window   = ABSENT in the reference; north-rule extension
  → ``F.session_window(ts, gap)``.

All three work identically on batch and streaming DataFrames; on a stream
the caller must have applied ``withWatermark`` so state is evicted (the
reference's ActionRemove analog) and append-mode output finalizes windows.

The aggregates run partial+final in the state store; the skewed ``source``
key is pre-reduced map-side (see skew.py for the explicit salting variant
used when a single window×key cell is still too hot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _aggs(agg_exprs: dict[str, str | Column]) -> list[Column]:
    return [
        (F.expr(e) if isinstance(e, str) else e).alias(name)
        for name, e in agg_exprs.items()
    ]


def tumbling_window_accu(
    df: DataFrame,
    time_col: str,
    size: str,
    keys: list[str],
    agg_exprs: dict[str, str | Column],
) -> DataFrame:
    """Tumbling-window accumulate: one interval per event (range+proj+accu)."""
    return (
        df.groupBy(F.window(F.col(time_col), size).alias("win"), *keys)
        .agg(*_aggs(agg_exprs))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *[F.col(n) for n in agg_exprs],
        )
    )


def sliding_window_accu(
    df: DataFrame,
    time_col: str,
    size: str,
    slide: str,
    keys: list[str],
    agg_exprs: dict[str, str | Column],
) -> DataFrame:
    """Sliding-window accumulate (roll analog): overlapping windows."""
    return (
        df.groupBy(F.window(F.col(time_col), size, slide).alias("win"), *keys)
        .agg(*_aggs(agg_exprs))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *[F.col(n) for n in agg_exprs],
        )
    )


def session_window_accu(
    df: DataFrame,
    time_col: str,
    gap: str,
    keys: list[str],
    agg_exprs: dict[str, str | Column],
) -> DataFrame:
    """Session-window accumulate: windows close after ``gap`` inactivity
    per key (north-rule extension beyond the reference)."""
    return (
        df.groupBy(F.session_window(F.col(time_col), gap).alias("win"), *keys)
        .agg(*_aggs(agg_exprs))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *[F.col(n) for n in agg_exprs],
        )
    )
