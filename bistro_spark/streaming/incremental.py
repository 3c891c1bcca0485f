"""Deterministic micro-batch driver — the exact-parity twin of Bistro
Streams' action loop (``server/.../server/Server.java#submit`` + worker
thread; actions ``ActionAdd`` / ``ActionRemove`` / ``ActionEval``).

The reference turns a table into a sliding event queue: connectors submit
ActionAdd(record), a timer submits ActionRemove (FIFO eviction beyond a max
length / max age) then ActionEval (propagate deltas through the column
graph). A single worker thread gives a total order over mutations, hence
deterministic results.

Here a micro-batch IS the ActionAdd delta, retention is applied to a
buffered window, and "evaluate" recompiles the calculus over the retained
population — semantically identical to the reference, whose accu/roll
columns always reflect the *current* table contents after eviction
(``Table.java#remove`` shrinks the population; ``Schema.java#evaluate``
re-aggregates). Two state strategies:

- ``retention=None`` (add-only streams): per-group aggregate state is
  MERGED batch-over-batch (state ∝ #groups — the scalable path, what
  Structured Streaming's state store does for us in streaming mode).
- count- or age-based retention: the runner buffers the retained rows
  (state ∝ window size, same asymptotics as Spark's windowed state) and
  recomputes aggregates per batch.

This mode exists for (a) row-for-row parity tests against the oracle with
scripted batch boundaries, (b) count-based retention, which Structured
Streaming cannot express (no count-based windows) — SURVEY.md §7.3/§7.4.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class AggSpec:
    """A merge-able accumulate: per-batch partial + cross-batch merge.

    sum/count merge with sum; min/max with min/max. avg must be declared as
    (sum, count) pairs and finalized — the classic partial-aggregate trick
    Spark itself uses for partial+final aggregation.

    ``invertible=True`` declares the merge additive (sum/count): eviction
    can then be UN-folded by subtracting the evicted span's partial instead
    of re-aggregating the whole retained buffer (the reference's accu
    shrink-on-remove, ColumnDefinitionAccu over the removed span). min/max
    have no inverse — leave False and the runner falls back to recompute.
    """

    name: str
    batch_expr: str  # aggregate over a batch, e.g. "sum(n_tok)"
    merge_expr: str  # merge partials, e.g. "sum" | "min" | "max"
    default: object = 0
    invertible: bool = False


class IncrementalRunner:
    """Scripted micro-batch evaluation of a grouped accumulate pipeline.

    Parameters
    ----------
    prepare: calc+link phase — fn(batch_df) -> DataFrame, applied to each
        incoming batch (the delta). This is where calc columns and link
        joins run: both are per-row/broadcast ops, so delta-only evaluation
        is exact — same argument the reference uses to evaluate calc/link
        over only the added span (ColumnDefinitionCalc/Link#evaluate).
    group_keys: accu grouping (the link column value).
    aggs: merge-able aggregate specs.
    retention_count / retention_age: FIFO eviction — max rows (by arrival
        order column ``order_col``) or max event-time age (vs the max event
        time seen so far — the watermark analog).
    """

    def __init__(
        self,
        spark: SparkSession,
        prepare: Callable[[DataFrame], DataFrame],
        group_keys: list[str],
        aggs: list[AggSpec],
        retention_count: int | None = None,
        retention_age: str | None = None,  # SQL interval, e.g. "30 seconds"
        order_col: str = "batch_ofs",
        time_col: str = "event_time",
        unfold: bool | None = None,  # None = auto (on iff all invertible)
    ):
        self.spark = spark
        self.prepare = prepare
        self.group_keys = group_keys
        self.aggs = aggs
        self.retention_count = retention_count
        self.retention_age = retention_age
        self.order_col = order_col
        self.time_col = time_col
        self._buffer: DataFrame | None = None  # retained window (retention mode)
        self._state: DataFrame | None = None  # merged aggregates (add-only mode)
        self._pin_ids: set[int] = set()  # executor blocks owned by buffer+state
        # un-fold mode: retention active AND every fold is invertible →
        # aggregate state is updated by (add delta partial, subtract evicted
        # partial); per-batch AGGREGATION work ∝ |delta| + |evicted| instead
        # of |window|. The buffer is still retained (eviction membership
        # needs it), but it is only filtered, never re-aggregated. A hidden
        # count column tracks live rows per group so fully-evicted groups
        # drop out of the read-out exactly as they do under recompute.
        auto = self._needs_buffer() and bool(aggs) and all(
            a.invertible for a in aggs
        )
        if unfold and not auto:
            raise ValueError(
                "unfold=True requires retention and all-invertible aggs"
            )
        self._unfold = auto if unfold is None else unfold
        self.batches_seen = 0

    _N = "__live_rows"

    def _partial(self, df: DataFrame, negate: bool = False) -> DataFrame:
        sign = -1 if negate else 1
        return df.groupBy(*self.group_keys).agg(
            *[
                (F.expr(a.batch_expr) * sign).alias(a.name)
                for a in self.aggs
            ],
            (F.count(F.lit(1)) * sign).alias(self._N),
        )

    # -- ActionAdd + ActionEval --------------------------------------------

    def add_batch(self, batch_df: DataFrame) -> None:
        """ActionAdd(delta) + ActionRemove(retention) + ActionEval."""
        from bistro_spark.caching import pin, release

        self.batches_seen += 1
        prepared = self.prepare(batch_df)
        # previous batch's pinned buffer/state blocks: still read while the
        # new state derives from them, released once the new pins are eager-
        # materialized — without this, a long-running stream leaks one
        # checkpoint per micro-batch (round-3 storage-lifecycle fix)
        old_ids, new_ids = self._pin_ids, set()

        if self._needs_buffer():
            buf = prepared if self._buffer is None else self._buffer.unionByName(prepared)
            keep = self._keep_predicate(buf)
            retained = buf.filter(keep) if keep is not None else buf
            # localCheckpoint truncates the ever-growing union lineage —
            # without it plan depth grows per batch (the classic
            # iterative-union pitfall).
            self._buffer, ids = pin(retained)
            new_ids |= ids
            if self._unfold:
                from functools import reduce

                parts = [self._partial(prepared)]
                if keep is not None:
                    parts.append(self._partial(buf.filter(~keep), negate=True))
                if self._state is not None:
                    parts.append(self._state)
                merged = (
                    reduce(lambda a, b: a.unionByName(b), parts)
                    .groupBy(*self.group_keys)
                    .agg(
                        *[
                            F.expr(f"sum({a.name})").alias(a.name)
                            for a in self.aggs
                        ],
                        F.expr(f"sum({self._N})").alias(self._N),
                    )
                    # prune fully-evicted groups from STATE, not just from
                    # read-out: otherwise state grows with all-time
                    # distinct keys instead of live keys. Safe — a
                    # reappearing key re-enters via its next delta partial.
                    # Caveat (documented, inherent to un-fold): double
                    # add/subtract partials accumulate FP drift vs
                    # recompute over very long runs; re-anchor periodically
                    # from the retained buffer if bit-parity matters.
                    .filter(F.col(self._N) != 0)
                )
                self._state, ids = pin(merged)
                new_ids |= ids
        else:
            partial = prepared.groupBy(*self.group_keys).agg(
                *[F.expr(a.batch_expr).alias(a.name) for a in self.aggs]
            )
            if self._state is None:
                merged = partial
            else:
                merged = (
                    self._state.unionByName(partial)
                    .groupBy(*self.group_keys)
                    .agg(
                        *[
                            F.expr(f"{a.merge_expr}({a.name})").alias(a.name)
                            for a in self.aggs
                        ]
                    )
                )
            self._state, ids = pin(merged)
            new_ids |= ids
        release(self.spark, old_ids)
        self._pin_ids = new_ids

    def _needs_buffer(self) -> bool:
        return self.retention_count is not None or self.retention_age is not None

    def _keep_predicate(self, buf: DataFrame):
        """ActionRemove as a predicate: FIFO count eviction / age eviction
        (server/.../actions/ActionRemove.java; age variant = the watermark
        analog). Returns a Column (rows to KEEP) or None if nothing evicts;
        the un-fold path negates it to aggregate exactly the evicted span.
        """
        preds = []
        if self.retention_count is not None:
            # keep the newest N by arrival order — the reference's
            # remove-oldest-beyond-max-length
            cutoff_row = (
                buf.select(self.order_col)
                .orderBy(F.col(self.order_col).desc())
                .limit(self.retention_count)
                .agg(F.min(self.order_col).alias("m"))
                .collect()[0]["m"]
            )
            if cutoff_row is not None:
                preds.append(F.col(self.order_col) >= cutoff_row)
        if self.retention_age is not None:
            max_t = buf.agg(F.max(self.time_col).alias("m")).collect()[0]["m"]
            if max_t is not None:
                preds.append(
                    F.col(self.time_col)
                    > F.lit(max_t) - F.expr(f"INTERVAL {self.retention_age}")
                )
        if not preds:
            return None
        pred = preds[0]
        for p in preds[1:]:
            pred = pred & p
        return pred

    # -- read-out -----------------------------------------------------------

    def result(self) -> DataFrame:
        """Current accumulate values (the reference's getValue read-out
        after evaluate).

        In un-fold mode this is a plain read of the maintained state —
        groups whose rows were all evicted are dropped via the hidden
        live-row count, and NO aggregation over the retained buffer appears
        in the plan (asserted by tests); recompute mode re-aggregates the
        buffer (the fallback for non-invertible folds)."""
        if self._needs_buffer():
            if self._buffer is None:
                raise ValueError("no batches added")
            if self._unfold:
                return self._state.filter(F.col(self._N) > 0).drop(self._N)
            return self._buffer.groupBy(*self.group_keys).agg(
                *[F.expr(a.batch_expr).alias(a.name) for a in self.aggs]
            )
        if self._state is None:
            raise ValueError("no batches added")
        return self._state

    def window(self) -> DataFrame:
        """The retained population (retention mode only) — for roll columns
        and inspection."""
        if self._buffer is None:
            raise ValueError("retention mode only")
        return self._buffer
