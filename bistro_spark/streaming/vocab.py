"""Streaming vocabulary monitor: entropy + Zipf exponent per trigger.

``token_entropy`` and ``zipf_alpha`` share one sufficient statistic —
the (group, term, c) term-frequency store. Counts are additive
integers, so the store merges across micro-batches by summation and
every report computed FROM the store equals the batch operator over the
union of all deltas, exactly, at every trigger (the drift/cube/funnel
contract).

State is vocabulary-sized (|groups| x |terms-seen|) — bounded by the
corpus vocabulary, not the stream length (Heaps' law: sublinear growth;
the same asymptote any exact vocabulary needs). Per trigger the delta
reduces to its own (group, term, c) grid in one partial-aggregated
groupBy — the only data-sized work — and the merge is a union + re-agg
over store ∪ delta. On a real cluster the store is an Iceberg/Delta
table MERGE'd per trigger, co-partitioned on (group, term).

One store, two live reports — the pattern that matters operationally:
entropy collapse and alpha steepening are the two earliest template-
spam alarms, and they come for free off the same state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bistro_spark.caching import pin, release


def _term_counts(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    return (
        df.select(
            F.col(group_col),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _entropy_from_counts(counts: DataFrame, group_col: str) -> DataFrame:
    per_group = counts.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(
            F.round(F.col("c") * F.log("c"), 9).cast("decimal(38,9)")
        ).alias("_clnc"),
        F.sum(
            F.round(F.log(F.col("c") * 2.0), 9).cast("decimal(38,9)")
        ).alias("_slnx"),
    )
    return per_group.select(
        group_col,
        "n_terms",
        "n_tokens",
        F.round(
            F.log("n_tokens")
            - F.col("_clnc").cast("double") / F.col("n_tokens"),
            6,
        ).alias("entropy"),
        F.round(
            F.lit(1.0) + F.col("n_terms") / F.col("_slnx").cast("double"),
            6,
        ).alias("alpha"),
    )


class StreamingVocabMonitor:
    """Feed micro-batches to :meth:`process_batch`; each call returns
    the current (group, n_terms, n_tokens, entropy, alpha) report for
    everything seen so far — exact batch parity per trigger."""

    def __init__(
        self,
        spark: SparkSession,
        group_col: str = "source",
        text_col: str = "text",
    ):
        self.spark = spark
        self.group_col = group_col
        self.text_col = text_col
        self._store: DataFrame | None = None
        self._pin_ids: set[int] = set()
        self.batches_seen = 0

    def state_rows(self) -> int:
        """|groups| x |terms seen| — vocabulary-, not stream-sized."""
        return 0 if self._store is None else self._store.count()

    def process_batch(self, batch_df: DataFrame) -> DataFrame:
        self.batches_seen += 1
        delta = _term_counts(batch_df, self.group_col, self.text_col)
        merged = (
            delta
            if self._store is None
            else self._store.unionByName(delta)
            .groupBy(self.group_col, "term")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        store, ids = pin(merged)
        old = self._pin_ids
        self._store = store
        self._pin_ids = ids
        release(self.spark, old)
        return _entropy_from_counts(store, self.group_col)

    def close(self) -> None:
        release(self.spark, self._pin_ids)
        self._pin_ids = set()
        self._store = None
