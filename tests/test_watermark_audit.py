"""watermark_audit: exact parity with a brute-force Python reference
(same md5 arrival buckets, same trigger semantics), plus the structural
properties a delay-grid audit must satisfy."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from bistro_spark.operators.temporal import watermark_audit

N_BATCHES = 4
DELAYS = (0, 600, 3600, 86400)


def _rows(n=200):
    t0 = datetime(2024, 3, 1)
    out = []
    for i in range(n):
        # deliberately non-monotone event times vs arrival id
        ts = t0 + timedelta(seconds=(i * 1117) % 7919)
        out.append((i, ts))
    return out


def _brute(rows, n_batches, delays):
    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_batches

    us = {i: int(ts.timestamp() * 1_000_000) for i, ts in rows}
    mx = {}
    for i, _ in rows:
        b = bucket(i)
        mx[b] = max(mx.get(b, 0), us[i])
    want = {}
    for d in delays:
        late = 0
        for i, _ in rows:
            b = bucket(i)
            prev = [mx[q] for q in mx if q < b]
            if prev and us[i] < max(prev) - d * 1_000_000:
                late += 1
        want[d] = late
    return want


def test_matches_brute_force_reference(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {
        r["delay_s"]: (r["n_events"], r["n_late"])
        for r in watermark_audit(
            df, n_batches=N_BATCHES, delays_s=DELAYS
        ).collect()
    }
    want = _brute(rows, N_BATCHES, DELAYS)
    assert got == {d: (len(rows), want[d]) for d in DELAYS}
    # sanity: the fixture actually exercises lateness
    assert want[0] > 0


def test_late_counts_monotone_in_delay(spark):
    df = spark.createDataFrame(_rows(), "event_id long, ts timestamp")
    out = sorted(
        (r["delay_s"], r["n_late"], r["frac_late"])
        for r in watermark_audit(
            df, n_batches=N_BATCHES, delays_s=DELAYS
        ).collect()
    )
    lates = [n for _, n, _ in out]
    assert lates == sorted(lates, reverse=True)
    # a delay exceeding the fixture's full time span drops nothing
    span_s = 7919
    huge = watermark_audit(
        df, n_batches=N_BATCHES, delays_s=(span_s + 1,)
    ).collect()[0]
    assert huge["n_late"] == 0 and huge["frac_late"] == 0.0


def test_single_batch_never_late(spark):
    """With one trigger there is no prior watermark — nothing drops."""
    df = spark.createDataFrame(_rows(50), "event_id long, ts timestamp")
    out = watermark_audit(df, n_batches=1, delays_s=(0,)).collect()[0]
    assert out["n_late"] == 0 and out["n_events"] == 50
