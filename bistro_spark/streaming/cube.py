"""Streaming twin of the OLAP rollup report (`operators.olap.rollup_report`)
— the live mixture dashboard: per trigger, the (d1, d2) cell / subtotal /
grand-total table of everything ingested so far.

Like the drift monitor, this is the easy-exact case: the rollup's
sufficient statistic is the additive (d1, d2, count, sum) CELL grid —
bounded by |d1|×|d2| no matter how long the stream runs — and every
rollup level is derivable from the cells by re-aggregation over that
tiny grid. So state is ONE pinned cell grid; per trigger the only
data-sized work is one partial-aggregated groupBy reducing the delta to
its grid; the merge and the three grouping-set expansions run over
grid-sized inputs. Output after k triggers equals the batch
``rollup_report`` of the union of all deltas EXACTLY (pytest-pinned) —
counts and BIGINT sums are order- and batching-independent by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bistro_spark.caching import pin, release

_ALL = "(all)"


class StreamingCubeMonitor:
    """Per-trigger rollup report of the stream seen so far. Feed
    micro-batch DataFrames to :meth:`process_batch` (foreachBatch-shaped);
    each call returns the current (d1, d2, n_rows, total_len) table with
    '(all)' subtotal and grand-total rows — the batch operator's exact
    schema and values."""

    def __init__(
        self,
        spark: SparkSession,
        dims: tuple[str, str] = ("source", "lang"),
        len_col: str = "n_chars",
    ):
        self.spark = spark
        self.dims = dims
        self.len_col = len_col
        self._grid: DataFrame | None = None
        self._pin_ids: set[int] = set()
        self.batches_seen = 0

    def state_rows(self) -> int:
        return 0 if self._grid is None else self._grid.count()

    def _cells(self, df: DataFrame) -> DataFrame:
        d1, d2 = self.dims
        return df.groupBy(d1, d2).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(self.len_col).cast("long")).cast("long").alias("total_len"),
        )

    def process_batch(self, batch_df: DataFrame) -> DataFrame:
        self.batches_seen += 1
        d1, d2 = self.dims
        delta = self._cells(batch_df)
        merged = (
            delta
            if self._grid is None
            else self._grid.unionByName(delta)
            .groupBy(d1, d2)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("total_len").cast("long").alias("total_len"),
            )
        )
        old = self._pin_ids
        self._grid, self._pin_ids = pin(merged)
        release(self.spark, old)
        return self.report()

    def report(self) -> DataFrame:
        """Rollup-expand the retained cell grid (grid-sized work)."""
        d1, d2 = self.dims
        g = (
            self._grid
            if self._grid is not None
            else self.spark.createDataFrame(
                [], f"{d1} string, {d2} string, n_rows long, total_len long"
            )
        )
        lvl = lambda e1, e2: g.groupBy().agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("total_len").cast("long").alias("total_len"),
        ).select(e1.alias(d1), e2.alias(d2), "n_rows", "total_len")
        cells = g.select(d1, d2, "n_rows", "total_len")
        sub = (
            g.groupBy(d1)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("total_len").cast("long").alias("total_len"),
            )
            .select(d1, F.lit(_ALL).alias(d2), "n_rows", "total_len")
        )
        grand = lvl(F.lit(_ALL), F.lit(_ALL))
        out = cells.unionByName(sub).unionByName(grand)
        # an empty stream has no grand-total row yet (sum over zero rows
        # yields one NULL row from groupBy().agg) — drop it
        return out.filter(F.col("n_rows").isNotNull())

    def close(self) -> None:
        release(self.spark, self._pin_ids)
        self._pin_ids = set()
        self._grid = None
