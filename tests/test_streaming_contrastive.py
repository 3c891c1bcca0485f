"""Streaming contrastive miner: EXACT any-order full-history parity
with the hash-checked batch contrastive_topk at every trigger, replay
idempotence, JSON kill/resume, and the anchor-bounded state guard."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bistro_spark.operators.similarity import contrastive_topk
from bistro_spark.streaming.contrastive import StreamingContrastiveMiner

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _anchors(emb):
    return emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )


def _batch_pairs(emb, anchors, k):
    return sorted(tuple(r) for r in contrastive_topk(emb, anchors, k=k).collect())


def test_any_order_parity_at_every_trigger(spark):
    emb = spark.read.parquet(EMB)
    anchors = _anchors(emb)
    for order in ([0, 1, 2, 3], [3, 1, 0, 2]):
        miner = StreamingContrastiveMiner(spark, anchors, k=4)
        seen = None
        for part in order:
            delta = emb.filter(f"vec_id % 4 = {part}")
            seen = delta if seen is None else seen.union(delta)
            miner.process_batch(delta)
            got = sorted(tuple(r) for r in miner.pairs().collect())
            assert got == _batch_pairs(seen, anchors, 4)


def test_replay_idempotent_and_state_bound(spark):
    emb = spark.read.parquet(EMB)
    anchors = _anchors(emb)
    miner = StreamingContrastiveMiner(spark, anchors, k=5)
    d = emb.filter("vec_id % 2 = 0")
    assert miner.process_batch(d) > 0
    assert miner.process_batch(d) == 0  # exact replay is a no-op
    got = sorted(tuple(r) for r in miner.pairs().collect())
    assert got == _batch_pairs(d, anchors, 5)
    # anchor-bounded state: <= anchors * 2 kinds * k entries
    n = sum(len(m) for m in miner._best.values())
    assert n <= 3 * 2 * 5


def test_kill_resume_json(spark):
    emb = spark.read.parquet(EMB)
    anchors = _anchors(emb)
    a = StreamingContrastiveMiner(spark, anchors, k=3)
    a.process_batch(emb.filter("vec_id < 250"))
    snap = json.loads(json.dumps(a.state_snapshot()))
    b = StreamingContrastiveMiner(spark, anchors, k=3)
    b.restore_state(snap)
    b.process_batch(emb.filter("vec_id >= 250"))
    got = sorted(tuple(r) for r in b.pairs().collect())
    assert got == _batch_pairs(emb, anchors, 3)
