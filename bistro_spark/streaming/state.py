"""Order-dependent accumulates — the accu folds a hash aggregate cannot
express.

The reference's accu lambda folds facts in ARRIVAL (row-id) order
(``core/.../core/ColumnDefinitionAccu.java#evaluate`` iterates the added
span in id order), so non-commutative folds (EWMA, last-value,
state-machine CEP) are well-defined there. Spark's agg() is unordered, so
these route through grouped-map pandas (batch) or
``applyInPandasWithState`` (streaming), ordered by the lineage offset
``batch_ofs`` that our sources carry (the Bistro row-id analog).

Everything is Arrow-batched and vectorized inside the group (numpy closed
forms, no per-row Python loops) per the input_hint.

Scale: state is one row per group key; groups are hash-partitioned so the
stateful stage scales horizontally. A skewed group key should be salted
only if the fold is decomposable — EWMA is (exponent algebra below), a
general CEP is not; that trade-off is inherent, not Spark-specific.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ewma_update(acc: float | None, xs: np.ndarray, alpha: float) -> float:
    """Fold EWMA over xs in order, starting from acc — closed form:
    acc*(1-a)^n + a * sum((1-a)^(n-1-i) * x_i), vectorized."""
    n = len(xs)
    if n == 0:
        return acc if acc is not None else float("nan")
    w = (1 - alpha) ** np.arange(n - 1, -1, -1, dtype=np.float64)
    s = float(alpha * np.dot(w, xs))
    if acc is None:
        # first observation seeds the average (pandas ewm adjust=False
        # convention): acc = x_0, then fold the rest
        acc = float(xs[0])
        if n == 1:
            return acc
        w = (1 - alpha) ** np.arange(n - 2, -1, -1, dtype=np.float64)
        return float(acc * (1 - alpha) ** (n - 1) + alpha * np.dot(w, xs[1:]))
    return float(acc * (1 - alpha) ** n + s)


def ewma_batch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_col: str = "batch_ofs",
    alpha: float = 0.1,
) -> DataFrame:
    """Batch order-dependent accu: EWMA per group over arrival order.
    applyInPandas per group; inside the group a numpy closed form."""
    in_types = dict(df.dtypes)
    out_schema = (
        ", ".join(f"{k} {in_types[k]}" for k in keys) + ", ewma double, n long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        xs = pdf[value_col].to_numpy(dtype=np.float64)
        acc = _ewma_update(None, xs, alpha)
        return pd.DataFrame(
            {**{k: [pdf[k].iloc[0]] for k in keys}, "ewma": [acc], "n": [len(xs)]}
        )

    return df.groupBy(*keys).applyInPandas(fold, out_schema)


def ewma_stream(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_col: str = "batch_ofs",
    alpha: float = 0.1,
) -> DataFrame:
    """Streaming order-dependent accu via applyInPandasWithState: state =
    (ewma, n); each micro-batch folds its (order-sorted) rows into the
    state — exactly the reference's incremental accu over the added span.
    Emits the running value per group per batch (update semantics)."""
    in_types = dict(df.dtypes)
    out_schema = (
        ", ".join(f"{k} {in_types[k]}" for k in keys) + ", ewma double, n long"
    )
    state_schema = "ewma double, n long"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            acc, n = state.get
        else:
            acc, n = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            xs = pdf[value_col].to_numpy(dtype=np.float64)
            acc = _ewma_update(acc, xs, alpha)
            n += len(xs)
        state.update((acc, n))
        yield pd.DataFrame(
            {**{k: [key[i]] for i, k in enumerate(keys)}, "ewma": [acc], "n": [n]}
        )

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def fifo_window_stream(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    max_len: int,
    order_col: str = "batch_ofs",
) -> DataFrame:
    """Streaming count-based FIFO retention — the ActionRemove max-length
    eviction (``server/.../actions/ActionRemove.java``) as a TRUE streaming
    operator, which Structured Streaming's windows cannot express (they are
    time-based only).

    Per group key, state = the last ``max_len`` values in arrival order
    (``order_col``); each micro-batch appends its (sorted) rows, trims to
    the newest ``max_len``, and emits the retained window's aggregates
    (n / sum / min / max) in update mode. State is bounded by
    groups × max_len.

    The reference's max-length queue is per-table and single-threaded; a
    keyed state is the distributed generalization — pass a constant key
    column to reproduce the reference's exact per-table semantics (at the
    cost of one state partition, the same serialization point the
    reference's worker thread is)."""
    in_types = dict(df.dtypes)
    out_schema = (
        ", ".join(f"{k} {in_types[k]}" for k in keys)
        + ", n long, sum_val double, min_val double, max_val double"
    )
    state_schema = "ords array<long>, vals array<double>"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ords, vals = state.get
            ords = list(ords)
            vals = list(vals)
        else:
            ords, vals = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            ords.extend(int(o) for o in pdf[order_col])
            vals.extend(float(v) for v in pdf[value_col])
        if len(vals) > max_len:
            ords, vals = ords[-max_len:], vals[-max_len:]
        state.update((ords, vals))
        arr = np.asarray(vals, dtype=np.float64)
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(keys)},
                "n": [len(arr)],
                "sum_val": [float(arr.sum())],
                "min_val": [float(arr.min())],
                "max_val": [float(arr.max())],
            }
        )

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def accu_stream_tws(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_col: str = "batch_ofs",
    alpha: float = 0.1,
) -> DataFrame:
    """ewma_stream on the transformWithStateInPandas API (Spark 4.x).

    Same semantics as ewma_stream (running order-dependent EWMA + count per
    group, update mode); the new API brings typed per-state-variable
    handles, TTL, and RocksDB-backed state out of the box — the forward
    path for custom stateful operators. Kept API-parallel so tests assert
    both implementations produce identical state trajectories.

    NOTE: TWS's state-server wire protocol needs the ``protobuf`` package
    (absent in this offline container → the parity test auto-skips);
    ewma_stream (applyInPandasWithState) is the dependency-free twin.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    in_types = dict(df.dtypes)
    out_schema = (
        ", ".join(f"{k} {in_types[k]}" for k in keys) + ", ewma double, n long"
    )

    class RunningEwma(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("acc", "ewma double, n long")

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                acc, n = self._state.get()
            else:
                acc, n = None, 0
            for pdf in rows:
                pdf = pdf.sort_values(order_col)
                xs = pdf[value_col].to_numpy(dtype=np.float64)
                acc = _ewma_update(acc, xs, alpha)
                n += len(xs)
            self._state.update((acc, n))
            yield pd.DataFrame(
                {
                    **{k: [key[i]] for i, k in enumerate(keys)},
                    "ewma": [acc],
                    "n": [n],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(*keys).transformWithStateInPandas(
        RunningEwma(), out_schema, "update", "None"
    )
