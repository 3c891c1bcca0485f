"""StreamingVocabGrowth: EXACT any-order full-history parity with batch
vocab_growth at every trigger (min/additive state), JSON kill/resume,
vocabulary-bounded state."""

from __future__ import annotations

import json

from bistro_spark.operators.olap import vocab_growth
from bistro_spark.streaming.vocab_growth import StreamingVocabGrowth

NB = 5


def _rows(n=90):
    rows = []
    for i in range(n):
        words = [f"w{(i * 3 + j * j) % (8 + i)}" for j in range(10)]
        rows.append((i, " ".join(words)))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _want(spark, rows):
    return sorted(
        tuple(r)
        for r in vocab_growth(_df(spark, rows), n_checkpoints=NB).collect()
    )


def test_any_order_parity_every_trigger(spark):
    rows = _rows()
    orders = [rows, sorted(rows, key=lambda r: (r[0] * 7919) % 43)]
    for order in orders:
        mon = StreamingVocabGrowth(spark, n_checkpoints=NB)
        cuts = [0, 25, 60, len(order)]
        seen: list = []
        for lo, hi in zip(cuts, cuts[1:]):
            seen.extend(order[lo:hi])
            mon.process_batch(_df(spark, order[lo:hi]))
            got = sorted(tuple(r) for r in mon.report().collect())
            assert got == _want(spark, seen)


def test_kill_resume_and_state_bounds(spark):
    rows = _rows()
    full = StreamingVocabGrowth(spark, n_checkpoints=NB)
    full.process_batch(_df(spark, rows[:40]))
    snap = json.loads(json.dumps(full.state_snapshot()))
    full.process_batch(_df(spark, rows[40:]))
    fresh = StreamingVocabGrowth(spark, n_checkpoints=NB)
    fresh.restore_state(snap)
    fresh.process_batch(_df(spark, rows[40:]))
    assert fresh.state_snapshot() == full.state_snapshot()
    # state is vocabulary-bounded: one entry per distinct term
    vocab = {w for _, t in rows for w in t.split(" ")}
    assert set(fresh.state_snapshot()["first"]) == vocab
    tiny = StreamingVocabGrowth(spark, n_checkpoints=NB, max_terms=3)
    try:
        tiny.process_batch(_df(spark, rows))
        raise AssertionError("max_terms guard did not fire")
    except ValueError as e:
        assert "term store" in str(e)
