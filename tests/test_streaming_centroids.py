"""Streaming centroid-shift monitor: EXACT any-order full-history
parity with the hash-checked batch centroid_shift at every trigger
(reference fixed, live side additive), JSON kill/resume, guards."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.similarity import centroid_shift
from bistro_spark.streaming.centroids import StreamingCentroidShiftMonitor

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_any_order_parity_at_every_trigger(spark):
    emb = spark.read.parquet(EMB)
    ref = emb.filter("vec_id % 2 = 0")
    live = emb.filter("vec_id % 2 = 1")
    for order in ([0, 1, 2], [2, 0, 1]):
        mon = StreamingCentroidShiftMonitor(spark, ref)
        seen = None
        for part in order:
            delta = live.filter(f"vec_id % 6 = {2 * part + 1}")
            seen = delta if seen is None else seen.union(delta)
            mon.process_batch(delta)
            assert _sorted(mon.report()) == _sorted(
                centroid_shift(ref, seen)
            )


def test_kill_resume_and_guards(spark):
    emb = spark.read.parquet(EMB)
    ref = emb.filter("vec_id % 2 = 0")
    live = emb.filter("vec_id % 2 = 1")
    a = StreamingCentroidShiftMonitor(spark, ref)
    a.process_batch(live.filter("vec_id < 250"))
    snap = json.loads(json.dumps(a.state_snapshot()))
    b = StreamingCentroidShiftMonitor(spark, ref)
    b.restore_state(snap)
    b.process_batch(live.filter("vec_id >= 250"))
    assert _sorted(b.report()) == _sorted(centroid_shift(ref, live))
    # label-only-in-reference rows carry NULL shift until it arrives live
    with pytest.raises(ValueError, match="empty reference"):
        StreamingCentroidShiftMonitor(spark, emb.filter("vec_id < 0"))
    with pytest.raises(ValueError, match="NULL label"):
        StreamingCentroidShiftMonitor(spark, ref).process_batch(
            spark.createDataFrame(
                [(1, [0.1], None)],
                "vec_id long, embedding array<float>, label int",
            )
        )
    with pytest.raises(ValueError, match="max_cells"):
        c = StreamingCentroidShiftMonitor(spark, ref, max_cells=3)
        c.process_batch(live)
