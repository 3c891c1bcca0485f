"""Streaming twin of ``operators/curation.bottomk_sample``: a
deterministic uniform-without-replacement sample of everything the
stream has EVER carried, maintained in O(k) state.

Bottom-k by a hash key is a mergeable summary: bottom-k(A ∪ B) =
bottom-k(bottom-k(A) ∪ bottom-k(B)). Each trigger therefore reduces its
delta DISTRIBUTED-side to at most k candidates (TakeOrderedAndProject),
and the driver merge keeps the k smallest overall — EXACT any-order
full-history parity with the batch operator at every trigger, pinned.
Replays are idempotent (the merge dedups by id), and state is exactly
k rows regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingBottomKSampler:
    """Feed per-trigger deltas to :meth:`process_batch`; read the live
    sample via :meth:`sample` — same schema and rows as batch
    ``bottomk_sample`` over everything seen."""

    def __init__(
        self,
        spark: SparkSession,
        id_col: str = "doc_id",
        k: int = 100,
        keep_cols: tuple[str, ...] = ("source", "n_chars"),
    ):
        self.spark = spark
        self.id_col = id_col
        self.k = int(k)
        self.keep_cols = tuple(keep_cols)
        self._best: list = []  # [(sample_key, id, *keep)] sorted, <= k
        self._schema = None
        self.batches_seen = 0

    # ------------------------------------------------------- recovery --
    def state_snapshot(self) -> list:
        return [list(r) for r in self._best]

    def restore_state(self, snapshot: list) -> None:
        self._best = [tuple(r) for r in snapshot]

    # ---------------------------------------------------------- fold --
    def process_batch(self, batch_df: DataFrame) -> int:
        """Merge one trigger's delta; returns how many sample slots
        changed (0 on a pure replay)."""
        self.batches_seen += 1
        cols = [self.id_col, *self.keep_cols]
        delta = (
            batch_df.select(
                F.md5(F.col(self.id_col).cast("string")).alias(
                    "sample_key"
                ),
                *cols,
            )
            .orderBy("sample_key", self.id_col)
            .limit(self.k)
        )
        if self._schema is None:
            self._schema = delta.schema
        merged = {(r[0], r[1]): tuple(r) for r in self._best}
        before = set(merged)
        for r in delta.collect():
            merged[(r["sample_key"], r[self.id_col])] = tuple(r)
        best = sorted(merged.values())[: self.k]
        changed = len(set((r[0], r[1]) for r in best) - before)
        self._best = best
        return changed

    # -------------------------------------------------------- sample --
    def sample(self) -> DataFrame:
        """The live sample — column order matches the batch operator
        (id, keeps, sample_key)."""
        assert self._schema is not None, "no batch processed yet"
        df = self.spark.createDataFrame(self._best, self._schema)
        return df.select(self.id_col, *self.keep_cols, "sample_key")
