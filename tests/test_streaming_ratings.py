"""Streaming BT monitor: EXACT any-order full-history parity with the
hash-checked batch bt_ratings at every trigger (shared fixpoint code
path), JSON kill/resume, self-game and item-cap guards."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.preference import (
    bt_ratings,
    preference_pairs,
    win_rate_matrix,
)
from bistro_spark.streaming.ratings import StreamingBTMonitor

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _games(spark):
    """Source-vs-source head-to-heads from the preference pairs (the
    contract query's construction at test scale)."""
    docs = spark.read.parquet(DOCS).select("doc_id", "source")
    cands = spark.read.parquet(DOCS).select(
        (F.col("doc_id") / 5).cast("long").alias("prompt_id"),
        F.col("doc_id").alias("cand_id"),
        F.col("n_chars").alias("reward"),
    )
    return (
        preference_pairs(cands)
        .join(
            docs.select(
                F.col("doc_id").alias("chosen"),
                F.col("source").alias("winner"),
            ),
            "chosen",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("rejected"),
                F.col("source").alias("loser"),
            ),
            "rejected",
        )
        .filter(F.col("winner") != F.col("loser"))
        .select("winner", "loser")
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_any_order_parity_at_every_trigger(spark):
    games = _games(spark).withColumn(
        "gid", F.monotonically_increasing_id()
    ).localCheckpoint()
    for order in ([0, 1, 2], [2, 0, 1]):
        mon = StreamingBTMonitor(spark)
        seen = None
        for part in order:
            delta = games.filter(f"gid % 3 = {part}")
            seen = delta if seen is None else seen.union(delta)
            mon.process_batch(delta.select("winner", "loser"))
            assert _sorted(mon.ratings()) == _sorted(
                bt_ratings(seen.select("winner", "loser"))
            )
            assert _sorted(mon.win_matrix()) == _sorted(
                win_rate_matrix(seen.select("winner", "loser"))
            )


def test_kill_resume_and_guards(spark):
    games = _games(spark).withColumn(
        "gid", F.monotonically_increasing_id()
    ).localCheckpoint()
    a = StreamingBTMonitor(spark)
    a.process_batch(games.filter("gid % 2 = 0").select("winner", "loser"))
    snap = json.loads(json.dumps(a.state_snapshot()))
    b = StreamingBTMonitor(spark)
    b.restore_state(snap)
    b.process_batch(games.filter("gid % 2 = 1").select("winner", "loser"))
    assert _sorted(b.ratings()) == _sorted(
        bt_ratings(games.select("winner", "loser"))
    )
    with pytest.raises(ValueError, match="self-game"):
        StreamingBTMonitor(spark).process_batch(
            spark.createDataFrame(
                [("A", "A")], "winner string, loser string"
            )
        )
    with pytest.raises(ValueError, match="max_items"):
        StreamingBTMonitor(spark, max_items=2).process_batch(
            spark.createDataFrame(
                [("A", "B"), ("B", "C"), ("C", "A")],
                "winner string, loser string",
            )
        )
