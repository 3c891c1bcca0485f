"""Explicit skew handling: salted two-phase aggregation.

The north rule calls out the zipf-skewed ``source`` key (weights 8:4:2:1 →
the 'web' partition carries >50% of all rows). Spark's map-side partial
aggregation already absorbs most of it for algebraic aggregates, and AQE
splits skewed JOIN partitions — but two cases still need explicit salt:

1. high-cardinality state per hot key (e.g. collect_set / exact distinct),
   where partial aggregation doesn't shrink the hot partition,
2. stateful streaming aggregation, where the state-store partition for the
   hot key becomes the straggler every micro-batch.

Pattern: pre-aggregate on (key, salt) with salt = crc32(row-unique) % S —
S-way fan-out of the hot key — then final-merge on key. Requires the
aggregate be decomposable (partial_expr feeding merge_expr over partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, unique_col: str | Column) -> DataFrame:
    """Append a deterministic salt in [0, n_salts) derived from a
    row-unique column (NOT rand(): replays must salt identically for
    exactly-once parity)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return df.withColumn("_salt", F.crc32(c.cast("string")) % n_salts)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_exprs: dict[str, str],
    merge_exprs: dict[str, str],
    n_salts: int = 16,
    unique_col: str = "doc_id",
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    partial_exprs: name -> aggregate over raw rows  (e.g. 'count(*)')
    merge_exprs:   name -> aggregate over partials  (e.g. 'sum(n)')
    The first shuffle is keyed (keys..., _salt) → ≤ n_salts× the key
    cardinality, uniformly spread; the second shuffles only
    |keys|×n_salts pre-reduced rows.
    """
    salted = with_salt(df, n_salts, unique_col)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.expr(e).alias(n) for n, e in partial_exprs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.expr(e).alias(n) for n, e in merge_exprs.items()]
    )
