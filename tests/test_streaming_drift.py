"""Streaming drift monitor — scripted micro-batch parity with the batch
op over full history, plus the constant-size-state bound."""

from __future__ import annotations

from bistro_spark.caching import pinned_ids
from bistro_spark.streaming.drift import StreamingDriftMonitor


def _doc_batches(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "n_chars")
    )
    ref = docs.filter("doc_id % 2 = 0")
    deltas = [docs.filter(f"doc_id % 2 = 1 AND doc_id % 3 = {i}") for i in range(3)]
    return ref, deltas


def test_streaming_drift_matches_batch_over_full_history(spark):
    """Counts are additive, so the monitor after k triggers must equal
    the batch op on (reference, union of all deltas) EXACTLY — no
    reservoir caveat, unlike the token-budget twin."""
    from bistro_spark.operators.drift import length_drift

    ref, deltas = _doc_batches(spark)
    mon = StreamingDriftMonitor(spark, ref)
    seen = None
    try:
        for d in deltas:
            got = sorted(tuple(r) for r in mon.process_batch(d).collect())
            seen = d if seen is None else seen.unionByName(d)
            want = sorted(tuple(r) for r in length_drift(ref, seen).collect())
            assert got == want
    finally:
        mon.close()


def test_streaming_drift_state_is_group_bucket_bounded(spark):
    """The retained grid never exceeds groups x 16 rows no matter how
    many batches stream through — the state bound that makes this a
    forever-running monitor."""
    ref, deltas = _doc_batches(spark)
    n_groups = ref.select("source").distinct().count()
    mon = StreamingDriftMonitor(spark, ref)
    try:
        for _ in range(2):  # replay the deltas: more batches, same bound
            for d in deltas:
                mon.process_batch(d)
        assert 0 < mon.state_rows() <= n_groups * 16
        assert mon.batches_seen == 6
    finally:
        mon.close()


def test_streaming_drift_close_releases_all_pins(spark):
    """close() frees both the reference grid and the retained grid —
    the storage-lifecycle discipline from the round-3 verdict."""
    ref, deltas = _doc_batches(spark)
    before = pinned_ids(spark)
    mon = StreamingDriftMonitor(spark, ref)
    mon.process_batch(deltas[0])
    mon.process_batch(deltas[1])
    assert pinned_ids(spark) - before  # grids are pinned while live
    mon.close()
    assert pinned_ids(spark) - before == set()
    mon.close()  # idempotent


def test_streaming_drift_new_group_scores_two(spark):
    """A group that exists only in the stream (never in the reference)
    reports the disjoint-distribution maximum l1_drift = 2.0."""
    ref = (
        _doc_batches(spark)[0]
        .filter("source <> 'src0'")
    )
    mon = StreamingDriftMonitor(spark, ref)
    try:
        only_new = (
            _doc_batches(spark)[0]
            .limit(50)
            .selectExpr("doc_id", "'src0' AS source", "n_chars")
        )
        out = {r["source"]: r for r in mon.process_batch(only_new).collect()}
        assert out["src0"]["l1_drift"] == 2.0
        assert out["src0"]["n_old"] == 0
    finally:
        mon.close()


def test_streaming_drift_empty_delta_keeps_parity(spark):
    """An empty micro-batch leaves the report unchanged (grid merge with
    zero rows is a no-op)."""
    ref, deltas = _doc_batches(spark)
    mon = StreamingDriftMonitor(spark, ref)
    try:
        first = sorted(tuple(r) for r in mon.process_batch(deltas[0]).collect())
        again = sorted(
            tuple(r)
            for r in mon.process_batch(deltas[0].filter("1 = 0")).collect()
        )
        assert first == again
    finally:
        mon.close()


def test_streaming_ks_matches_batch_at_every_trigger(spark):
    """The (group, length, count) grid is additive → after k triggers
    the KS report equals the batch ks_drift on the union of the first k
    deltas exactly (integer max/argmax: no float tolerance needed)."""
    from bistro_spark.operators.olap import ks_drift
    from bistro_spark.streaming.drift import StreamingKSMonitor

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "n_chars")
    deltas = [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]
    mon = StreamingKSMonitor(spark)
    seen = None
    try:
        for d in deltas:
            got = sorted(tuple(r) for r in mon.process_batch(d).collect())
            seen = d if seen is None else seen.unionByName(d)
            assert got == sorted(tuple(r) for r in ks_drift(seen).collect())
    finally:
        mon.close()


def test_streaming_ks_state_is_grid_bounded_and_pins_release(spark):
    from bistro_spark.caching import pinned_ids
    from bistro_spark.streaming.drift import StreamingKSMonitor

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "n_chars")
    before = pinned_ids(spark)
    mon = StreamingKSMonitor(spark)
    for i in range(2):
        mon.process_batch(docs.filter(f"doc_id % 2 = {i}"))
    distinct_cells = docs.select("source", "n_chars").distinct().count()
    assert mon.state_rows() <= distinct_cells
    mon.close()
    assert pinned_ids(spark) == before
