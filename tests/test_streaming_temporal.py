"""Streaming temporal twins — scripted micro-batch parity with the batch
sessionize / transition_matrix over full history, exactly-once session
emission, state bounds, and pin lifecycle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bistro_spark.caching import pinned_ids
from bistro_spark.operators.temporal import sessionize, transition_matrix
from bistro_spark.streaming.temporal import (
    StreamingSessionizer,
    StreamingTransitionCounter,
)

GAP_S = 600.0


def _time_split(spark, n=3):
    """Split the events table into n batches by event time — a global
    time split is per-key in-order by construction (the twins' ordering
    contract)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = ev.agg(F.min(us), F.max(us)).collect()[0]
    cuts = [lo + (hi - lo + 1) * i // n for i in range(n + 1)]
    return ev, [
        ev.filter((us >= cuts[i]) & (us < cuts[i + 1])) for i in range(n)
    ]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------- transition counter ----
def test_streaming_transitions_match_batch_at_every_trigger(spark):
    """The grid is additive and the per-key latest event seeds the lag
    across the boundary, so after k in-order triggers the report equals
    the batch op on the first k batches EXACTLY."""
    ev, deltas = _time_split(spark)
    ctr = StreamingTransitionCounter(spark)
    seen = None
    try:
        for d in deltas:
            got = _rows(ctr.process_batch(d))
            seen = d if seen is None else seen.unionByName(d)
            assert got == _rows(transition_matrix(seen))
    finally:
        ctr.close()


def test_streaming_transitions_state_bound(spark):
    """State = grid (≤ types²) + one seed row per key — independent of
    how many batches stream through."""
    ev, deltas = _time_split(spark, n=5)
    n_types = ev.select("event_type").distinct().count()
    n_keys = ev.select("user_id").distinct().count()
    ctr = StreamingTransitionCounter(spark)
    try:
        for d in deltas:
            ctr.process_batch(d)
        assert 0 < ctr.state_rows() <= n_types * n_types + n_keys
    finally:
        ctr.close()


# ------------------------------------------------------- sessionizer ----
def test_streaming_sessionize_full_history_parity(spark):
    """emissions ∪ flush() == batch sessionize row-for-row, including
    the per-key 1-based session_idx — across a 4-way time split that
    cuts many sessions mid-flight."""
    ev, deltas = _time_split(spark, n=4)
    szr = StreamingSessionizer(spark, gap_s=GAP_S)
    try:
        emitted = []
        for d in deltas:
            emitted.extend(szr.process_batch(d).collect())
        emitted.extend(szr.flush().collect())
        got = sorted(tuple(r) for r in emitted)
        assert got == _rows(sessionize(ev, gap_s=GAP_S))
    finally:
        szr.close()


def test_streaming_sessionize_exactly_once_and_cross_batch_merge(spark):
    """Hand-built stream: one session split across a batch boundary must
    merge (one emitted row with the combined aggregate), every session
    is emitted exactly once, and a successor in a later batch closes the
    open session without flush()."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    mk = lambda uid, eid, sec, val: (uid, t0 + dt.timedelta(seconds=sec), eid, val)
    schema = "user_id long, ts timestamp, event_id long, value double"
    b1 = spark.createDataFrame(
        [mk(1, 1, 0, 1.0), mk(1, 2, 100, 2.0)], schema
    )
    # eid 3 extends the open session (gap 600 ≥ 200); eid 4 starts a new
    # session 1000 s later, closing session 1 by succession
    b2 = spark.createDataFrame(
        [mk(1, 3, 300, 3.0), mk(1, 4, 1300, 4.0)], schema
    )
    szr = StreamingSessionizer(spark, gap_s=GAP_S)
    try:
        out1 = szr.process_batch(b1).collect()
        assert out1 == []  # open, nothing immutable yet
        out2 = szr.process_batch(b2).collect()
        assert len(out2) == 1
        s1 = out2[0]
        assert (s1.session_idx, s1.n_events, s1.sum_value) == (1, 3, 6.0)
        assert s1.duration_s == 300.0
        tail = szr.flush().collect()
        assert len(tail) == 1 and tail[0].session_idx == 2
        assert tail[0].n_events == 1 and tail[0].sum_value == 4.0
    finally:
        szr.close()


def test_streaming_sessionize_watermark_closes_idle_sessions(spark):
    """With a watermark, an idle key's session is emitted WITHOUT flush
    once max-event-time − watermark passes last_ts + gap — the
    forever-running-monitor path (no end-of-stream in production)."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    mk = lambda uid, eid, sec, val: (uid, t0 + dt.timedelta(seconds=sec), eid, val)
    schema = "user_id long, ts timestamp, event_id long, value double"
    b1 = spark.createDataFrame([mk(7, 1, 0, 5.0)], schema)
    # a DIFFERENT key's event far in the future advances the watermark
    b2 = spark.createDataFrame([mk(8, 2, 10_000, 1.0)], schema)
    szr = StreamingSessionizer(spark, gap_s=GAP_S, watermark_s=0.0)
    try:
        assert szr.process_batch(b1).collect() == []
        out = szr.process_batch(b2).collect()
        assert [(r.user_id, r.session_idx, r.n_events) for r in out] == [(7, 1, 1)]
        assert szr.open_sessions() == 1  # key 8 still open
    finally:
        szr.close()


def test_streaming_temporal_close_releases_all_pins(spark):
    """Both twins free every pinned block on close() — the
    storage-lifecycle discipline from the round-3 verdict."""
    ev, deltas = _time_split(spark)
    before = pinned_ids(spark)
    ctr = StreamingTransitionCounter(spark)
    szr = StreamingSessionizer(spark, gap_s=GAP_S)
    for d in deltas:
        ctr.process_batch(d)
        szr.process_batch(d)
    assert len(pinned_ids(spark)) > len(before)
    ctr.close()
    szr.close()
    assert pinned_ids(spark) <= before


# ---------------------------------------------------- cohort tracker ----
def test_streaming_cohort_matches_batch_at_every_trigger(spark):
    """Cohorts freeze at first sight, the seen-set dedups repeat
    activity, the grid is additive → after k in-order triggers the
    report equals the batch op on the union of the first k batches."""
    from bistro_spark.operators.temporal import cohort_retention
    from bistro_spark.streaming.temporal import StreamingCohortTracker

    ev, deltas = _time_split(spark, n=4)
    trk = StreamingCohortTracker(spark)
    seen = None
    try:
        for d in deltas:
            got = _rows(trk.process_batch(d))
            seen = d if seen is None else seen.unionByName(d)
            assert got == _rows(cohort_retention(seen))
    finally:
        trk.close()


def test_streaming_cohort_state_is_activity_bounded(spark):
    """State ≤ distinct key-weeks + keys + triangle cells — replaying
    the same batches adds NOTHING (the seen-set absorbs repeats)."""
    from bistro_spark.streaming.temporal import StreamingCohortTracker

    ev, deltas = _time_split(spark, n=3)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    n_pairs = (
        ev.select("user_id", F.floor(us / 604_800_000_000).alias("w"))
        .distinct()
        .count()
    )
    n_keys = ev.select("user_id").distinct().count()
    trk = StreamingCohortTracker(spark)
    try:
        for d in deltas:
            trk.process_batch(d)
        size1 = trk.state_rows()
        for d in deltas:  # replay: pure no-op for the state
            trk.process_batch(d)
        assert trk.state_rows() == size1
        assert size1 <= n_pairs + n_keys + n_pairs  # seen + cohorts + grid
    finally:
        trk.close()
