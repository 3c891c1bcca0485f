"""Streaming funnel monitor — scripted micro-batch parity with the batch
filter_funnel over full history, plus the constant-size-state bound and
the pin-lifecycle contract."""

from __future__ import annotations

from bistro_spark.caching import pinned_ids
from bistro_spark.operators.curation import filter_funnel
from bistro_spark.streaming.funnel import StreamingFunnelMonitor


def _batches(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    return docs, [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]


def test_streaming_funnel_matches_batch_over_full_history(spark):
    """Counts are additive and attribution is per-document stateless, so
    the monitor after k triggers must equal the batch funnel on the union
    of all deltas EXACTLY."""
    _, deltas = _batches(spark)
    mon = StreamingFunnelMonitor(spark)
    seen = None
    try:
        for d in deltas:
            got = sorted(tuple(r) for r in mon.process_batch(d).collect())
            seen = d if seen is None else seen.unionByName(d)
            want = sorted(tuple(r) for r in filter_funnel(seen).collect())
            assert got == want
    finally:
        mon.close()


def test_streaming_funnel_state_is_rule_bounded(spark):
    """The retained grid never exceeds #rules + 1 rows no matter how many
    batches stream through."""
    _, deltas = _batches(spark)
    mon = StreamingFunnelMonitor(spark)
    try:
        for _ in range(2):
            for d in deltas:
                mon.process_batch(d)
        assert 0 < mon.state_rows() <= 5
        assert mon.batches_seen == 6
    finally:
        mon.close()


def test_streaming_funnel_close_releases_all_pins(spark):
    _, deltas = _batches(spark)
    before = pinned_ids(spark)
    mon = StreamingFunnelMonitor(spark)
    mon.process_batch(deltas[0])
    mon.process_batch(deltas[1])
    assert pinned_ids(spark) - before
    mon.close()
    assert pinned_ids(spark) - before == set()
    mon.close()  # idempotent


def test_streaming_funnel_empty_batch_is_identity(spark):
    """An empty micro-batch must not disturb the cumulative report."""
    docs, deltas = _batches(spark)
    mon = StreamingFunnelMonitor(spark)
    try:
        before = sorted(tuple(r) for r in mon.process_batch(deltas[0]).collect())
        after = sorted(
            tuple(r) for r in mon.process_batch(docs.filter("1=0")).collect()
        )
        assert before == after
    finally:
        mon.close()
