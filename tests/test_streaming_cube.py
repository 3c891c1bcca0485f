"""Streaming cube monitor — full-history parity with the batch rollup at
every trigger, the grid-size state bound, and pin lifecycle."""

from __future__ import annotations

from bistro_spark.caching import pinned_ids
from bistro_spark.operators.olap import rollup_report
from bistro_spark.streaming.cube import StreamingCubeMonitor


def _batches(spark, n=3):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "lang", "n_chars"
    )
    return [docs.filter(f"doc_id % {n} = {i}") for i in range(n)]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_cube_matches_batch_at_every_trigger(spark):
    """Counts/sums are additive → after k triggers the report equals the
    batch rollup_report on the union of the first k deltas EXACTLY."""
    deltas = _batches(spark)
    mon = StreamingCubeMonitor(spark)
    seen = None
    try:
        for d in deltas:
            got = _rows(mon.process_batch(d))
            seen = d if seen is None else seen.unionByName(d)
            assert got == _rows(rollup_report(seen))
    finally:
        mon.close()


def test_streaming_cube_state_is_cell_bounded_and_pins_release(spark):
    deltas = _batches(spark, n=5)
    full = deltas[0]
    for d in deltas[1:]:
        full = full.unionByName(d)
    n_cells = full.select("source", "lang").distinct().count()
    before = pinned_ids(spark)
    mon = StreamingCubeMonitor(spark)
    for _ in range(2):  # replay: more batches, same bound
        for d in deltas:
            mon.process_batch(d)
    assert 0 < mon.state_rows() <= n_cells
    assert len(pinned_ids(spark)) > len(before)
    mon.close()
    assert pinned_ids(spark) <= before
    assert mon.batches_seen == 10


def test_streaming_cube_empty_start(spark):
    mon = StreamingCubeMonitor(spark)
    try:
        assert mon.report().collect() == []
        empty = _batches(spark)[0].limit(0)
        assert mon.process_batch(empty).collect() == []
    finally:
        mon.close()


def _event_batches(spark, n=3):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "value"
    )
    return [ev.filter(f"event_id % {n} = {i}") for i in range(n)]


def test_streaming_heatmap_matches_batch_at_every_trigger(spark):
    """The 168-cell grid is additive and carries exact decimal sums →
    after k triggers the report equals the batch load_heatmap on the
    union of the first k deltas bit-for-bit (round-6 incl.)."""
    from bistro_spark.operators.temporal import load_heatmap
    from bistro_spark.streaming.cube import StreamingHeatmap

    deltas = _event_batches(spark)
    mon = StreamingHeatmap(spark)
    seen = None
    try:
        for d in deltas:
            got = _rows(mon.process_batch(d))
            seen = d if seen is None else seen.unionByName(d)
            assert got == _rows(load_heatmap(seen))
    finally:
        mon.close()


def test_streaming_heatmap_state_bound_and_pin_release(spark):
    from bistro_spark.streaming.cube import StreamingHeatmap

    before = pinned_ids(spark)
    mon = StreamingHeatmap(spark)
    for d in _event_batches(spark, n=2):
        mon.process_batch(d)
    assert mon.state_rows() <= 168
    mon.close()
    assert pinned_ids(spark) == before
