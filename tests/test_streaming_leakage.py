"""Streaming leak monitor: EXACT any-order full-history parity with the
hash-checked batch split_leakage_audit at every trigger, replay
idempotence, driver-side split rule pinned against batch split_corpus,
JSON kill/resume, state guard."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.curation import (
    split_corpus,
    split_leakage_audit,
)
from bistro_spark.operators.dedup import simhash_hamming_pairs
from bistro_spark.streaming.leakage import StreamingLeakMonitor

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def _batch_audit(spark, edges):
    ids = (
        edges.select(F.col("id_a").alias("doc_id"))
        .union(edges.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    return split_leakage_audit(edges, split_corpus(ids, key_col="doc_id"))


def test_any_order_parity_and_replay(spark):
    edges = simhash_hamming_pairs(
        spark.read.parquet(DOCS), bits=16, max_hamming=2
    ).select("id_a", "id_b")
    for order in ([0, 1, 2], [2, 0, 1]):
        mon = StreamingLeakMonitor(spark)
        seen = None
        for part in order:
            delta = edges.filter(f"(id_a + id_b) % 3 = {part}")
            seen = delta if seen is None else seen.union(delta)
            mon.process_batch(delta)
            assert _sorted(mon.audit()) == _sorted(
                _batch_audit(spark, seen)
            )
        # all three parts tile the edge set, so a full replay is a no-op
        assert mon.process_batch(edges) == 0
        assert mon.audit().filter("is_leak").count() > 0


def test_split_rule_matches_batch(spark):
    mon = StreamingLeakMonitor(spark)
    ids = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    want = {
        r["doc_id"]: r["split"]
        for r in split_corpus(ids, key_col="doc_id").collect()
    }
    assert all(mon._split(i) == s for i, s in want.items())


def test_kill_resume_and_guard(spark):
    edges = simhash_hamming_pairs(
        spark.read.parquet(DOCS), bits=16, max_hamming=2
    ).select("id_a", "id_b")
    a = StreamingLeakMonitor(spark)
    a.process_batch(edges.filter("id_a % 2 = 0"))
    snap = json.loads(json.dumps(a.state_snapshot()))
    b = StreamingLeakMonitor(spark)
    b.restore_state(snap)
    b.process_batch(edges.filter("id_a % 2 = 1"))
    assert _sorted(b.audit()) == _sorted(_batch_audit(spark, edges))
    with pytest.raises(ValueError, match="max_state"):
        c = StreamingLeakMonitor(spark, max_state=1)
        c.process_batch(edges)
    with pytest.raises(ValueError, match="sum to 1"):
        StreamingLeakMonitor(spark, weights={"train": 0.5})
