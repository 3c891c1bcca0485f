"""CDC changelog application: batch snapshot semantics (last write wins,
tombstones, no-resurrect), the no-window plan shape, and the streaming
upsert store's any-order / replay / kill-resume parity contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from bistro_spark.operators.cdc import apply_changelog
from bistro_spark.streaming.cdc import StreamingUpsertStore

SCHEMA = "entity_id long, seq long, op string, event_type string, value double"

LOG = [
    # k=1: two upserts — latest wins
    (1, 10, "U", "signup", 1.0),
    (1, 20, "U", "click", 2.0),
    # k=2: upsert then delete — absent from snapshot
    (2, 11, "U", "signup", 3.0),
    (2, 25, "D", "error", 0.0),
    # k=3: delete then LATER upsert — resurrects (higher seq wins)
    (3, 12, "D", "error", 0.0),
    (3, 30, "U", "purchase", 9.5),
    # k=4: delete then EARLIER upsert (late arrival) — stays deleted
    (4, 40, "D", "error", 0.0),
    (4, 35, "U", "view", 4.0),
    # k=5: single upsert
    (5, 13, "U", "view", 7.25),
]

WANT = {
    1: (20, "click", 2.0),
    3: (30, "purchase", 9.5),
    5: (13, "view", 7.25),
}


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_apply_changelog_worked_example(spark):
    got = {
        r["entity_id"]: (r["version"], r["event_type"], r["value"])
        for r in apply_changelog(_df(spark, LOG)).collect()
    }
    assert got == WANT


def test_apply_changelog_plan_has_no_window_sort(spark):
    """Last-write-wins must be the partial-aggregatable struct-max, not a
    row_number window: no Window node, a map-side partial_max before the
    ONE entity-keyed exchange (shuffle volume entity-bounded, never
    log-bounded)."""
    df = apply_changelog(_df(spark, LOG))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Window" not in final
    assert "partial_max" in final
    assert final.count("Exchange hashpartitioning") == 1


def test_apply_changelog_empty_and_all_deleted(spark):
    empty = apply_changelog(_df(spark, []))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "entity_id",
        "version",
        "event_type",
        "value",
    ]
    dead = apply_changelog(
        _df(spark, [(7, 1, "U", "signup", 1.0), (7, 2, "D", "error", 0.0)])
    )
    assert dead.count() == 0


def _snap_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_any_order_parity_every_trigger(spark):
    """Snapshot equals batch apply_changelog over everything seen, at
    EVERY trigger, in ANY arrival order (max is commutative/associative)."""
    orders = [
        sorted(LOG, key=lambda r: r[1]),  # seq-monotone arrival
        sorted(LOG, key=lambda r: (r[1] * 7919) % 23),  # scrambled
        list(reversed(sorted(LOG, key=lambda r: r[1]))),  # reverse
    ]
    for rows in orders:
        store = StreamingUpsertStore(spark)
        cuts = [0, 3, 6, len(rows)]
        seen = []
        for lo, hi in zip(cuts, cuts[1:]):
            seen.extend(rows[lo:hi])
            store.process_batch(_df(spark, rows[lo:hi]))
            assert _snap_rows(store.snapshot()) == _snap_rows(
                apply_changelog(_df(spark, seen))
            )


def test_streaming_tombstone_blocks_late_upsert(spark):
    store = StreamingUpsertStore(spark)
    store.process_batch(_df(spark, [(4, 40, "D", "error", 0.0)]))
    store.process_batch(_df(spark, [(4, 35, "U", "view", 4.0)]))
    assert store.snapshot().count() == 0
    # ...but a HIGHER-seq upsert resurrects
    store.process_batch(_df(spark, [(4, 41, "U", "view", 5.0)]))
    assert _snap_rows(store.snapshot()) == [(4, 41, "view", 5.0)]


def test_streaming_replay_idempotent(spark):
    """At-least-once delivery: re-folding the same delta is a no-op."""
    store = StreamingUpsertStore(spark)
    batch = LOG[:5]
    assert store.process_batch(_df(spark, batch)) > 0
    before = _snap_rows(store.snapshot())
    assert store.process_batch(_df(spark, batch)) == 0
    assert _snap_rows(store.snapshot()) == before


def test_streaming_kill_resume_parity(spark):
    rows = sorted(LOG, key=lambda r: r[1])
    cuts = [0, 4, 7, len(rows)]
    full = StreamingUpsertStore(spark)
    snaps = []
    for lo, hi in zip(cuts, cuts[1:]):
        full.process_batch(_df(spark, rows[lo:hi]))
        snaps.append(full.state_snapshot())
    resumed = StreamingUpsertStore(spark)
    resumed.process_batch(_df(spark, rows[cuts[0] : cuts[1]]))
    fresh = StreamingUpsertStore(spark)
    fresh.restore_state(snaps[0])
    for lo, hi in zip(cuts[1:], cuts[2:]):
        fresh.process_batch(_df(spark, rows[lo:hi]))
    assert fresh.state_snapshot() == snaps[-1]
    assert _snap_rows(fresh.snapshot()) == _snap_rows(full.snapshot())


def test_streaming_state_entity_bounded(spark):
    store = StreamingUpsertStore(spark)
    store.process_batch(_df(spark, LOG))
    # one state row per DISTINCT key (tombstones retained), not per log row
    snap = store.state_snapshot()
    assert set(snap) == {1, 2, 3, 4, 5}
    assert len(snap) < len(LOG)
    # guard fires when the key budget would be exceeded
    tiny = StreamingUpsertStore(spark, max_keys=2)
    try:
        tiny.process_batch(_df(spark, LOG))
        raise AssertionError("max_keys guard did not fire")
    except ValueError as e:
        assert "key count" in str(e)


# ------------------------------------------------------ SCD2 history ----


def test_changelog_history_worked_example(spark):
    from bistro_spark.operators.cdc import changelog_history

    got = {
        (r["entity_id"], r["seq_from"]): (r["seq_to"], r["is_current"])
        for r in changelog_history(_df(spark, LOG)).collect()
    }
    assert got == {
        (1, 10): (20, False),
        (1, 20): (None, True),
        (2, 11): (25, False),   # closed by the delete tombstone
        (3, 30): (None, True),  # the post-delete re-insert
        (4, 35): (40, False),   # late upsert closed by the later delete
        (5, 13): (None, True),
    }


def test_history_reconstructs_any_as_of_snapshot(spark):
    """Filtering the history at sequence s equals replaying the log
    prefix seq <= s — the time-travel contract."""
    from pyspark.sql import functions as F

    from bistro_spark.operators.cdc import apply_changelog, changelog_history

    hist = changelog_history(_df(spark, LOG))
    for s in (12, 22, 27, 36, 41):
        as_of = {
            r["entity_id"]: (r["event_type"], r["value"])
            for r in hist.filter(
                (F.col("seq_from") <= s)
                & (F.col("seq_to").isNull() | (F.col("seq_to") > s))
            ).collect()
        }
        replay = {
            r["entity_id"]: (r["event_type"], r["value"])
            for r in apply_changelog(
                _df(spark, [r for r in LOG if r[1] <= s])
            ).collect()
        }
        assert as_of == replay, f"as-of {s}"
