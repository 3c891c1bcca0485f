"""Streaming twin of heavy hitters (`operators.text.heavy_hitters`).

The batch op is exact because it can recount candidates over the whole
corpus; an unbounded stream by definition cannot replay history, so the
streaming twin keeps the strongest contract that IS maintainable in
O(k) state — the mergeable Misra-Gries summary (Agarwal et al. 2012,
"Mergeable summaries"; same rule the batch op's per-partition kernel
uses):

- **no false negatives**: any word whose true frequency over EVERYTHING
  seen exceeds N/(k+1) is present in the summary;
- **one-sided error**: true(w) - N/(k+1) <= est(w) <= true(w).

Both properties survive arbitrary merge trees, so the monitor reduces
each micro-batch to a batch-level summary in Spark (per-partition
vectorized MG kernels via ``mapInPandas`` — the collect is bounded by
k x partitions rows, never vocabulary-sized) and MG-merges it into the
retained summary on the driver: add counters, subtract the (k+1)-th
largest, drop the non-positive remainder. State: one k-row pandas
Series + the running word total — checkpoint-trivial.

When exactness is needed (e.g. end of day), pass the retained candidate
set to the batch op's recount over the at-rest corpus; the summary's
superset property makes that recount sufficient. The parity tests pin
the superset property against the batch op over the accumulated union,
the two-sided estimate bound against exact counts, and the k-row state
bound across replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingHeavyHitters:
    """O(k)-state heavy-hitter monitor over an unbounded word stream."""

    def __init__(self, k: int = 50, text_col: str = "text"):
        import pandas as pd

        self.k = k
        self.text_col = text_col
        self._counters = pd.Series(dtype="int64")
        self.n_total = 0  # words seen across the whole stream
        self.batches_seen = 0

    def _cap(self) -> None:
        # the MG merge rule: keep at most k counters by subtracting the
        # (k+1)-th largest from all and dropping the non-positive rest —
        # the step whose total subtraction is bounded by N/(k+1)
        if len(self._counters) > self.k:
            m = self._counters.nlargest(self.k + 1).iloc[-1]
            self._counters = self._counters - m
            self._counters = self._counters[self._counters > 0]

    def process_batch(self, batch_df: DataFrame) -> "StreamingHeavyHitters":
        """Fold one micro-batch into the summary. Spark-side work is one
        scan producing per-partition MG summaries (<= k rows each) plus a
        codegen count; the driver merge touches <= k x (partitions + 1)
        rows."""
        import pandas as pd

        k = self.k
        terms = batch_df.select(
            F.explode(F.split(F.col(self.text_col), " ")).alias("word")
        )

        def mg_partition(batches):
            counters = pd.Series(dtype="int64")
            for b in batches:
                if not len(b):
                    continue
                vc = b["word"].value_counts()
                counters = counters.add(vc, fill_value=0)
                if len(counters) > k:
                    m = counters.nlargest(k + 1).iloc[-1]
                    counters = counters - m
                    counters = counters[counters > 0]
            if len(counters):
                yield pd.DataFrame(
                    {
                        "word": counters.index.astype(str),
                        "est": counters.to_numpy("int64"),
                    }
                )

        rows = terms.mapInPandas(mg_partition, "word string, est long").collect()
        self.n_total += terms.count()
        self.batches_seen += 1
        if rows:
            batch_sum = pd.Series(
                [r["est"] for r in rows],
                index=[r["word"] for r in rows],
                dtype="int64",
            ).groupby(level=0).sum()  # union-add partition summaries
            self._counters = self._counters.add(batch_sum, fill_value=0)
            self._cap()
        return self

    def candidates(self):
        """Current summary as a dict word -> estimated count (superset of
        every word with true stream frequency > n_total/(k+1))."""
        return {w: int(c) for w, c in self._counters.items()}

    def threshold(self) -> float:
        """The frequency bar the summary is guaranteed to cover."""
        return self.n_total / (self.k + 1)
