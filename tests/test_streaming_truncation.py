"""Streaming truncation monitor: EXACT any-order full-history parity
with the hash-checked batch context_truncation_sweep at every trigger
(engine-computed report rows hash-match), JSON kill/resume with a grid
guard, empty-delta tolerance."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.curation import context_truncation_sweep
from bistro_spark.streaming.truncation import StreamingTruncationMonitor

DOCS = "/root/testdata/sf0.001/documents.parquet"
GRID = (32, 64, 128)


def _lens(spark):
    return spark.read.parquet(DOCS).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_any_order_parity_at_every_trigger(spark):
    lens = _lens(spark)
    for order in ([0, 1, 2], [2, 0, 1]):
        mon = StreamingTruncationMonitor(spark, lengths=GRID)
        seen = None
        for part in order:
            delta = lens.filter(f"doc_id % 3 = {part}")
            seen = delta if seen is None else seen.union(delta)
            mon.process_batch(delta)
            assert _sorted(mon.report()) == _sorted(
                context_truncation_sweep(seen, lengths=GRID)
            )


def test_empty_delta_and_kill_resume(spark):
    lens = _lens(spark)
    a = StreamingTruncationMonitor(spark, lengths=GRID)
    a.process_batch(lens.filter("doc_id % 2 = 0"))
    a.process_batch(lens.filter("doc_id < 0"))  # empty delta: no change
    snap = json.loads(json.dumps(a.state_snapshot()))
    b = StreamingTruncationMonitor(spark, lengths=GRID)
    b.restore_state(snap)
    b.process_batch(lens.filter("doc_id % 2 = 1"))
    assert _sorted(b.report()) == _sorted(
        context_truncation_sweep(lens, lengths=GRID)
    )
    with pytest.raises(ValueError, match="grid"):
        c = StreamingTruncationMonitor(spark, lengths=(32, 999))
        c.restore_state(snap)
