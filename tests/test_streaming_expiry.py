"""StreamingExpiryMonitor: ANY-order status parity with batch
snapshot_expiry_plan at every trigger, rank parity on retained rows,
frozen-rank divergence on expired rows pinned, kill/resume, and
policy-bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from bistro_spark.operators.maintenance import snapshot_expiry_plan
from bistro_spark.streaming.maintenance import StreamingExpiryMonitor

RETAIN, CUTOFF = 2, "2024-01-10"


def _snaps():
    # two tables, 14 daily snapshots each (2024-01-01 .. 2024-01-14)
    rows = []
    for t in ("x", "y"):
        for d in range(1, 15):
            rows.append((t, d, f"2024-01-{d:02d} 06:00:00"))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "tbl string, snapshot_id long, committed_at string"
    ).withColumn("committed_at", F.col("committed_at").cast("timestamp"))


def _batch_status(spark, rows):
    return {
        (r["tbl"], r["snapshot_id"]): (r["status"], r["recency_rank"])
        for r in snapshot_expiry_plan(
            _df(spark, rows), retain_last=RETAIN, older_than=CUTOFF
        ).collect()
    }


def test_any_order_status_parity_every_trigger(spark):
    rows = _snaps()
    orders = [
        rows,  # ts-monotone commits (the natural case)
        sorted(rows, key=lambda r: (r[1] * 7919) % 29),  # scrambled
        list(reversed(rows)),  # newest-first
    ]
    for order in orders:
        mon = StreamingExpiryMonitor(
            spark, retain_last=RETAIN, older_than=CUTOFF
        )
        cuts = [0, 9, 17, len(order)]
        seen: list = []
        expired: dict = {}
        for lo, hi in zip(cuts, cuts[1:]):
            seen.extend(order[lo:hi])
            for r in mon.process_batch(_df(spark, order[lo:hi])).collect():
                expired[(r["tbl"], r["snapshot_id"])] = r["status"]
            live = {
                (r["tbl"], r["snapshot_id"]): (
                    r["status"],
                    r["recency_rank"],
                )
                for r in mon.report().collect()
            }
            want = _batch_status(spark, seen)
            # every seen snapshot is either live or expired, never both
            assert set(live) | set(expired) == set(want)
            assert not (set(live) & set(expired))
            # status parity everywhere; rank parity on retained rows
            for k, (st, rk) in live.items():
                assert (st, rk) == want[k], f"live {k}"
            for k, st in expired.items():
                assert want[k][0] == "expired" == st, f"expired {k}"


def test_expired_rank_frozen_counter_example(spark):
    """Batch ranks keep deepening after expiry; the monitor freezes the
    rank at emission — the documented divergence."""
    rows = [("x", d, f"2024-01-{d:02d} 06:00:00") for d in range(1, 15)]
    mon = StreamingExpiryMonitor(spark, retain_last=RETAIN, older_than=CUTOFF)
    got = {}
    for r in mon.process_batch(_df(spark, rows[:9])).collect():
        got[r["snapshot_id"]] = r["recency_rank"]
    mon.process_batch(_df(spark, rows[9:])).collect()
    want = _batch_status(spark, rows)
    frozen_diverges = any(
        want[("x", sid)][1] != rk for sid, rk in got.items()
    )
    assert frozen_diverges


def test_kill_resume_parity(spark):
    rows = _snaps()
    import json

    full = StreamingExpiryMonitor(spark, retain_last=RETAIN, older_than=CUTOFF)
    full.process_batch(_df(spark, rows[:10])).collect()
    # JSON round trip: the snapshot is integer-micros scalars only
    snap = json.loads(json.dumps(full.state_snapshot()))
    out_full = sorted(
        tuple(r) for r in full.process_batch(_df(spark, rows[10:])).collect()
    )
    fresh = StreamingExpiryMonitor(spark, retain_last=RETAIN, older_than=CUTOFF)
    fresh.restore_state(snap)
    out_res = sorted(
        tuple(r) for r in fresh.process_batch(_df(spark, rows[10:])).collect()
    )
    assert out_res == out_full
    assert fresh.state_snapshot() == full.state_snapshot()


def test_state_policy_bounded(spark):
    """Live state holds only retain_last + younger-than-cutoff rows —
    old history drains out instead of accumulating."""
    rows = _snaps()
    mon = StreamingExpiryMonitor(spark, retain_last=RETAIN, older_than=CUTOFF)
    mon.process_batch(_df(spark, rows)).collect()
    snap = mon.state_snapshot()
    # per table: 5 young (days 10-14) — days 1-9 expired except none are
    # within retain_last because ranks 1-2 are days 14,13 (already young)
    for t in ("x", "y"):
        assert len(snap[t]) == 5, snap[t]
    live_ids = {r["snapshot_id"] for r in mon.report().collect()}
    assert live_ids == {10, 11, 12, 13, 14}
