"""StreamingOrphanTracker: any-order report parity with batch
orphan_files(refs, snapshot_expiry_plan(snaps)) at every trigger (refs
arriving with their snapshots), pending-ref eventual consistency,
kill/resume, and dead-ref accounting for late edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from bistro_spark.operators.maintenance import (
    orphan_files,
    snapshot_expiry_plan,
)
from bistro_spark.streaming.maintenance import StreamingOrphanTracker

RETAIN, CUTOFF = 2, "2024-01-10"


def _snaps():
    rows = []
    for t in ("x", "y"):
        for d in range(1, 15):
            rows.append((t, d, f"2024-01-{d:02d} 06:00:00"))
    return rows


def _refs_for(t, d):
    # each snapshot references 3 files shared across ~3 consecutive days
    return [(t, d, (d // 3) * 10 + k) for k in range(3)]


def _sdf(spark, rows):
    return spark.createDataFrame(
        rows, "tbl string, snapshot_id long, committed_at string"
    ).withColumn("committed_at", F.col("committed_at").cast("timestamp"))


def _rdf(spark, rows):
    return spark.createDataFrame(
        rows, "tbl string, snapshot_id long, file_id long"
    )


def _want(spark, snaps, refs):
    plan = snapshot_expiry_plan(
        _sdf(spark, snaps), retain_last=RETAIN, older_than=CUTOFF
    )
    return sorted(
        tuple(r) for r in orphan_files(_rdf(spark, refs), plan).collect()
    )


def test_any_order_parity_every_trigger(spark):
    snaps = _snaps()
    orders = [snaps, sorted(snaps, key=lambda r: (r[1] * 7919) % 29)]
    for order in orders:
        mon = StreamingOrphanTracker(
            spark, retain_last=RETAIN, older_than=CUTOFF
        )
        cuts = [0, 9, 17, len(order)]
        seen_s: list = []
        seen_r: list = []
        for lo, hi in zip(cuts, cuts[1:]):
            batch_s = order[lo:hi]
            batch_r = [e for t, d, _ in batch_s for e in _refs_for(t, d)]
            seen_s.extend(batch_s)
            seen_r.extend(batch_r)
            mon.process_batch(
                _sdf(spark, batch_s), _rdf(spark, batch_r)
            ).collect()
            assert mon.pending_refs == 0
            got = sorted(tuple(r) for r in mon.report().collect())
            assert got == _want(spark, seen_s, seen_r)


def test_pending_ref_heals_on_snapshot_arrival(spark):
    mon = StreamingOrphanTracker(spark, retain_last=RETAIN, older_than=CUTOFF)
    s1 = [("x", 12, "2024-01-12 06:00:00")]
    # trigger 1: a ref whose snapshot has NOT arrived yet
    mon.process_batch(
        _sdf(spark, s1), _rdf(spark, [("x", 13, 999)])
    ).collect()
    assert mon.pending_refs == 1
    assert mon.report().filter("file_id = 999").count() == 0
    # trigger 2: the snapshot shows up — parity restored
    s2 = [("x", 13, "2024-01-13 06:00:00")]
    mon.process_batch(_sdf(spark, s2), _rdf(spark, [])).collect()
    assert mon.pending_refs == 0
    got = sorted(tuple(r) for r in mon.report().collect())
    assert got == _want(spark, s1 + s2, [("x", 13, 999)])


def test_late_ref_to_expired_snapshot_counts_dead(spark):
    snaps = _snaps()
    mon = StreamingOrphanTracker(spark, retain_last=RETAIN, older_than=CUTOFF)
    mon.process_batch(_sdf(spark, snaps), _rdf(spark, [])).collect()
    # day 1 expired (old, deep rank); its late ref must be a dead ref
    mon.process_batch(
        _sdf(spark, []), _rdf(spark, [("x", 1, 777)])
    ).collect()
    row = mon.report().filter("file_id = 777").collect()[0]
    assert (row["n_refs"], row["n_live_refs"], row["deletable"]) == (
        1,
        0,
        True,
    )
    assert mon.pending_refs == 0


def test_kill_resume_parity(spark):
    snaps = _snaps()
    refs = [e for t, d, _ in snaps for e in _refs_for(t, d)]
    full = StreamingOrphanTracker(spark, retain_last=RETAIN, older_than=CUTOFF)
    full.process_batch(
        _sdf(spark, snaps[:10]), _rdf(spark, refs[: 10 * 3])
    ).collect()
    import json

    # the snapshot must survive a JSON round trip (checkpoint persistence)
    snap = json.loads(json.dumps(full.state_snapshot()))
    full.process_batch(
        _sdf(spark, snaps[10:]), _rdf(spark, refs[10 * 3 :])
    ).collect()
    fresh = StreamingOrphanTracker(spark, retain_last=RETAIN, older_than=CUTOFF)
    fresh.restore_state(snap)
    fresh.process_batch(
        _sdf(spark, snaps[10:]), _rdf(spark, refs[10 * 3 :])
    ).collect()
    assert sorted(map(tuple, fresh.report().collect())) == sorted(
        map(tuple, full.report().collect())
    )


def test_live_maintenance_report_parity(spark):
    from bistro_spark.operators.maintenance import maintenance_report
    from bistro_spark.streaming.maintenance import (
        StreamingOrphanTracker,
        tracker_maintenance_report,
    )

    snaps = _snaps()
    mon = StreamingOrphanTracker(spark, retain_last=RETAIN, older_than=CUTOFF)
    cuts = [0, 9, 17, len(snaps)]
    seen_s: list = []
    seen_r: list = []
    for lo, hi in zip(cuts, cuts[1:]):
        batch_s = snaps[lo:hi]
        batch_r = [e for t, d, _ in batch_s for e in _refs_for(t, d)]
        seen_s.extend(batch_s)
        seen_r.extend(batch_r)
        mon.process_batch(_sdf(spark, batch_s), _rdf(spark, batch_r)).collect()
        got = sorted(
            tuple(r) for r in tracker_maintenance_report(mon).collect()
        )
        want = sorted(
            tuple(r)
            for r in maintenance_report(
                _sdf(spark, seen_s),
                _rdf(spark, seen_r),
                retain_last=RETAIN,
                older_than=CUTOFF,
            ).collect()
        )
        assert got == want
