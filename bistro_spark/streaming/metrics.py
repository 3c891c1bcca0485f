"""Per-partition lineage + metrics (north rule): ``df.observe()`` named
metrics in the plan + a StreamingQueryListener appending one row per
micro-batch to a JSONL metrics log, keyed (query_id, run_id, batch_id).

The reference has no metrics surface at all (results are read from
ColumnData in-process); this is pure engine infrastructure the north rule
adds. The listener runs on the driver and receives the numbers the
executors already computed — zero extra passes over the data.

Per-PARTITION lineage comes from the lineage columns the engine carries
(batch_ofs arrival offsets + spark_partition_id() stamped at read time):
``stamp_lineage`` adds them; sinks persist them with the rows, so any
output row traces back to (input file/offset range, executor partition).
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def stamp_lineage(df: DataFrame) -> DataFrame:
    """Append lineage columns: the physical partition that read the row and
    (streaming) the input file it came from."""
    return df.withColumn("_part_id", F.spark_partition_id()).withColumn(
        "_input_file", F.input_file_name()
    )


def observe_counts(df: DataFrame, name: str, *extra: Column) -> DataFrame:
    """Attach named observed metrics (row count + caller extras) evaluated
    inline with the plan — surfaced per micro-batch in listener events."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"), *extra)


class MetricsLogListener(StreamingQueryListener):
    """Appends one JSON line per micro-batch: batch id, rows/sec, duration
    breakdown, state-store metrics, watermark, and all observed metrics."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._write(
            {"event": "started", "query_id": str(event.id), "run_id": str(event.runId)}
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "query_id": str(p.id),
                "run_id": str(p.runId),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs) if p.durationMs else {},
                "watermark": p.eventTime.get("watermark") if p.eventTime else None,
                "state_operators": [
                    {
                        "num_rows_total": s.numRowsTotal,
                        "num_rows_updated": s.numRowsUpdated,
                        "memory_used_bytes": s.memoryUsedBytes,
                    }
                    for s in (p.stateOperators or [])
                ],
                "observed": {
                    name: dict(row.asDict()) if hasattr(row, "asDict") else dict(row)
                    for name, row in (p.observedMetrics or {}).items()
                },
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "query_id": str(event.id),
                "run_id": str(event.runId),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def _write(self, obj: dict) -> None:
        with self._lock:
            with open(self.path, "a") as f:
                f.write(json.dumps(obj, default=str) + "\n")


def partition_lineage_summary(
    df_with_lineage: DataFrame, ofs_col: str = "batch_ofs"
) -> DataFrame:
    """Roll committed output up to per-partition lineage rows:
    (partition, input file) → row count + offset range. ``ofs_col`` is the
    arrival-offset column (the Bistro row-id analog; any monotone row key
    works for batch tables)."""
    return df_with_lineage.groupBy("_part_id", "_input_file").agg(
        F.count("*").alias("rows"),
        F.min(ofs_col).alias("min_ofs"),
        F.max(ofs_col).alias("max_ofs"),
    )
