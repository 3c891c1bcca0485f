"""StreamingLatenessMonitor: report parity with batch watermark_audit
under the batch arrival model (md5 buckets in bucket order) at every
trigger, out-of-order divergence counter-example, kill/resume, and
scalar-bounded state."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from bistro_spark.operators.temporal import watermark_audit
from bistro_spark.streaming.lateness import StreamingLatenessMonitor

N_BATCHES = 4
DELAYS = (0, 600, 3600, 86400)


def _rows(n=200):
    t0 = datetime(2024, 3, 1)
    return [
        (i, t0 + timedelta(seconds=(i * 1117) % 7919)) for i in range(n)
    ]


def _bucket(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % N_BATCHES


def _df(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_parity_with_batch_audit_every_trigger(spark):
    rows = _rows()
    buckets = [[r for r in rows if _bucket(r[0]) == b] for b in range(N_BATCHES)]
    mon = StreamingLatenessMonitor(spark, delays_s=DELAYS)
    seen = []
    for b, batch in enumerate(buckets):
        seen.extend(batch)
        mon.process_batch(_df(spark, batch))
        got = sorted(tuple(r) for r in mon.report().collect())
        want = sorted(
            tuple(r)
            for r in watermark_audit(
                _df(spark, seen), n_batches=N_BATCHES, delays_s=DELAYS
            ).collect()
        )
        # the batch audit over `seen` with the SAME bucketing: only
        # buckets 0..b exist in its grid, which is exactly the monitor's
        # arrival history — so the reports must match at every trigger
        assert got == want, f"diverged at trigger {b}"
    # lateness is actually exercised
    assert mon.report().filter("delay_s = 0").collect()[0]["n_late"] > 0


def test_out_of_order_divergence_pinned(spark):
    """Arriving buckets in reverse order changes which events are late —
    the monitor measures the TRUE arrival sequence (documented
    contract), so it must diverge from the bucket-order batch model."""
    rows = _rows()
    buckets = [[r for r in rows if _bucket(r[0]) == b] for b in range(N_BATCHES)]
    mon = StreamingLatenessMonitor(spark, delays_s=(0,))
    for batch in reversed(buckets):
        mon.process_batch(_df(spark, batch))
    got = mon.report().collect()[0]["n_late"]
    want = (
        watermark_audit(_df(spark, rows), n_batches=N_BATCHES, delays_s=(0,))
        .collect()[0]["n_late"]
    )
    assert got != want


def test_kill_resume_parity(spark):
    rows = _rows()
    buckets = [[r for r in rows if _bucket(r[0]) == b] for b in range(N_BATCHES)]
    full = StreamingLatenessMonitor(spark, delays_s=DELAYS)
    full.process_batch(_df(spark, buckets[0]))
    snap = full.state_snapshot()
    for batch in buckets[1:]:
        full.process_batch(_df(spark, batch))
    fresh = StreamingLatenessMonitor(spark, delays_s=DELAYS)
    fresh.restore_state(snap)
    for batch in buckets[1:]:
        fresh.process_batch(_df(spark, batch))
    assert fresh.state_snapshot() == full.state_snapshot()


def test_state_scalar_bounded_and_empty_batch(spark):
    mon = StreamingLatenessMonitor(spark, delays_s=DELAYS)
    mon.process_batch(_df(spark, _rows(50)))
    mon.process_batch(_df(spark, []))  # empty trigger: no-op, no crash
    snap = mon.state_snapshot()
    assert set(snap) == {"wm_base", "n_events", "late"}
    assert len(snap["late"]) == len(DELAYS)
    assert snap["n_events"] == 50
