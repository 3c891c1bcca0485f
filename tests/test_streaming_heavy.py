"""Streaming heavy hitters — the mergeable-summary contract over
scripted micro-batches: superset of the batch op over full history,
two-sided estimate bound, O(k) state."""

from __future__ import annotations

from bistro_spark.streaming.heavy import StreamingHeavyHitters


def _doc_batches(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    return docs, [docs.filter(f"doc_id % 3 = {i}") for i in range(3)]


def test_streaming_heavy_superset_of_batch_over_full_history(spark):
    """After every trigger, the summary contains EVERY word the exact
    batch op reports over the accumulated union (MG: no false
    negatives above N/(k+1)), and n_total tracks the true word count."""
    from bistro_spark.operators.text import heavy_hitters

    docs, batches = _doc_batches(spark)
    mon = StreamingHeavyHitters(k=50)
    seen = None
    for b in batches:
        mon.process_batch(b)
        seen = b if seen is None else seen.unionByName(b)
        exact = {r["word"]: r["cnt"] for r in heavy_hitters(seen, k=50).collect()}
        cand = mon.candidates()
        assert set(exact) <= set(cand)
    assert mon.batches_seen == 3


def test_streaming_heavy_estimate_bounds(spark):
    """est <= true and true - est <= N/(k+1) for every retained word —
    the mergeable-summaries guarantee across the whole merge tree
    (partition kernels -> batch summary -> retained summary)."""
    from pyspark.sql import functions as F

    docs, batches = _doc_batches(spark)
    mon = StreamingHeavyHitters(k=50)
    for b in batches:
        mon.process_batch(b)
    true = {
        r["word"]: r["cnt"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert mon.n_total == sum(true.values())
    bar = mon.threshold()
    for w, est in mon.candidates().items():
        assert est <= true[w]
        assert true[w] - est <= bar


def test_streaming_heavy_state_stays_k_rows(spark):
    """Replaying the batches grows n_total but never the summary: state
    is bounded by k counters for an unbounded stream."""
    _, batches = _doc_batches(spark)
    mon = StreamingHeavyHitters(k=20)
    for _ in range(2):
        for b in batches:
            mon.process_batch(b)
    assert len(mon.candidates()) <= 20
    assert mon.batches_seen == 6


def test_streaming_heavy_empty_batch_is_noop(spark):
    _, batches = _doc_batches(spark)
    mon = StreamingHeavyHitters(k=10)
    mon.process_batch(batches[0])
    before = (mon.candidates(), mon.n_total)
    mon.process_batch(batches[0].filter("1 = 0"))
    assert (mon.candidates(), mon.n_total) == before
