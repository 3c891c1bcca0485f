"""Stateful stream-stream link — the link column when the target is itself
a stream.

The reference's link column (``core/.../core/Column.java#link``) looks up a
row of the target table at evaluation time; when both tables are fed by
streams (Bistro Streams wires two connectors into one schema and the
dependency graph joins their deltas), the lookup must hold *state*: a fact
may arrive before or after its match. Structured Streaming's watermarked
stream-stream join IS that state machine: each side buffers rows in the
state store until the other side's watermark proves no match can still
arrive (north_rule: "stateful join" keyed on doc_id).

Scale notes:
- State is bounded ONLY because of the event-time range condition +
  watermarks — an unbounded-delay join would buffer both streams forever.
  ``max_delay`` is therefore a required argument, not an option.
- The join shuffles both sides by the key: at 10^12 sequences the key
  (doc_id) is unique-ish → uniform hash, no salting needed; a skewed key
  would need the same salting as accumulate (skew.py).
- Outer variants emit the unmatched row only when the watermark closes its
  window (late emission is inherent to the semantics, not a bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PATH_SEP = "__"


def stream_stream_link(
    left: DataFrame,
    right: DataFrame,
    name: str,
    on: str,
    max_delay: str,
    time_col: str = "event_time",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on an equi key with watermark-bounded state.

    ``name`` prefixes the right side's columns (``name__col``) exactly like
    a batch link's path hops, so downstream calc/accu recipes are identical
    in batch and streaming mode. The right row must arrive within
    [-max_delay, +max_delay] of the left row's event time — the state
    retention contract.
    """
    wm = watermark or max_delay
    lt, rt = time_col, f"{name}{PATH_SEP}{time_col}"
    ron = f"{name}{PATH_SEP}{on}"
    # alias EVERY right column (key included) to the name__col prefix so no
    # join type — inner or outer — can emit two identically-named columns
    r = right.select(
        *[F.col(c).alias(f"{name}{PATH_SEP}{c}") for c in right.columns]
    )
    lw = left.withWatermark(lt, wm)
    rw = r.withWatermark(rt, wm)
    cond = (
        (lw[on] == rw[ron])
        & (rw[rt] >= F.expr(f"{lt} - INTERVAL {max_delay}"))
        & (rw[rt] <= F.expr(f"{lt} + INTERVAL {max_delay}"))
    )
    joined = lw.join(rw, cond, how)
    # the prefixed key duplicates the left key on matched rows; drop it for
    # inner joins (always equal) but keep it for outer joins, where a null
    # marks the unmatched side
    if how == "inner":
        joined = joined.drop(rw[ron])
    return joined
