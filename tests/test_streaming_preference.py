"""Streaming preference miner: EXACT any-order full-history parity with
the hash-checked batch preference_pairs / preference_stats at every
trigger, replay idempotence, the conflicting-reward guard, JSON
kill/resume, and the content-bounded state guard."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.preference import (
    preference_pairs,
    preference_pipeline,
    preference_stats,
    reward_normalize,
)
from bistro_spark.streaming.preference import StreamingPreferenceMiner

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _cands(spark):
    return spark.read.parquet(DOCS).select(
        (F.col("doc_id") % 10).alias("prompt_id"),
        F.col("doc_id").alias("cand_id"),
        F.col("n_chars").alias("reward"),
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_any_order_parity_at_every_trigger(spark):
    cands = _cands(spark)
    for order in ([0, 1, 2, 3], [3, 1, 0, 2]):
        miner = StreamingPreferenceMiner(spark)
        seen = None
        for part in order:
            delta = cands.filter(f"cand_id % 4 = {part}")
            seen = delta if seen is None else seen.union(delta)
            miner.process_batch(delta)
            assert _sorted(miner.pairs()) == _sorted(
                preference_pairs(seen)
            )
            assert _sorted(miner.stats()) == _sorted(
                preference_stats(seen)
            )
            assert _sorted(miner.normalized()) == _sorted(
                reward_normalize(seen)
            )
            assert _sorted(miner.pipeline_pairs()) == _sorted(
                preference_pipeline(seen)
            )


def test_replay_idempotent(spark):
    cands = _cands(spark)
    miner = StreamingPreferenceMiner(spark)
    d = cands.filter("cand_id % 2 = 0")
    assert miner.process_batch(d) > 0
    assert miner.process_batch(d) == 0  # exact replay is a no-op
    assert _sorted(miner.pairs()) == _sorted(preference_pairs(d))


def test_conflicting_reward_raises(spark):
    miner = StreamingPreferenceMiner(spark)
    miner.process_batch(
        spark.createDataFrame(
            [(1, 10, 5)], "prompt_id long, cand_id long, reward long"
        )
    )
    with pytest.raises(ValueError, match="different reward"):
        miner.process_batch(
            spark.createDataFrame(
                [(1, 10, 6)], "prompt_id long, cand_id long, reward long"
            )
        )
    # an in-delta conflict is caught by the distributed dedup itself
    with pytest.raises(ValueError, match="conflicting"):
        miner.process_batch(
            spark.createDataFrame(
                [(2, 20, 1), (2, 20, 2)],
                "prompt_id long, cand_id long, reward long",
            )
        )


def test_kill_resume_json_and_state_bound(spark):
    cands = _cands(spark)
    a = StreamingPreferenceMiner(spark)
    a.process_batch(cands.filter("cand_id < 25"))
    snap = json.loads(json.dumps(a.state_snapshot()))
    b = StreamingPreferenceMiner(spark)
    b.restore_state(snap)
    b.process_batch(cands.filter("cand_id >= 25"))
    assert _sorted(b.pairs()) == _sorted(preference_pairs(cands))
    assert _sorted(b.stats()) == _sorted(preference_stats(cands))
    # content-bounded state: exactly one slot per distinct candidate
    assert b.state_size() == cands.count()
    with pytest.raises(ValueError, match="max_state"):
        c = StreamingPreferenceMiner(spark, max_state=3)
        c.process_batch(cands)
