"""As-of link + CEP follow-pattern (operators/temporal.py): literal-fixture
semantics, plan shape (join-free as-of; no window in cep), bucketing
edge cases, and the monotone-hardening streaming parity of first-B."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bistro_spark.operators.temporal import cep_followed_by, link_asof


def _ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def test_link_asof_literal_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (2, 102, _ts(5)), (3, 103, _ts(9))],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 80.0), (1, _ts(15), 150.0), (2, _ts(5), 55.0)],
        ["k", "ts", "value"],
    )
    got = {
        r["lid"]: (r["asof_value"], r["asof_ts"])
        for r in link_asof(left, right, on="k").collect()
    }
    assert got[100] == (80.0, _ts(8))  # latest right <= ts
    assert got[101] == (150.0, _ts(15))
    assert got[102] == (55.0, _ts(5))  # equal ts is inclusive
    assert got[103] == (None, None)  # no right rows for key 3 → miss


def test_link_asof_horizon_stales_out(spark):
    left = spark.createDataFrame([(1, 1, _ts(30))], ["k", "lid", "ts"])
    right = spark.createDataFrame([(1, _ts(10), 5.0)], ["k", "ts", "value"])
    fresh = link_asof(left, right, on="k", horizon_s=1250).collect()[0]
    stale = link_asof(left, right, on="k", horizon_s=1150).collect()[0]
    assert fresh["asof_value"] == 5.0  # 20 min gap within ~20.8 min horizon
    assert stale["asof_value"] is None and stale["asof_ts"] is None


def test_link_asof_equal_ts_rights_deterministic_max(spark):
    """Among right rows tied on (key, ts) the max payload struct wins —
    pinned so the result is partitioning-independent."""
    left = spark.createDataFrame([(1, 1, _ts(10))], ["k", "lid", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(10), 3.0), (1, _ts(10), 9.0)], ["k", "ts", "value"]
    ).repartition(4)
    assert link_asof(left, right, on="k").collect()[0]["asof_value"] == 9.0


def test_link_asof_preserves_left_rowset_and_is_join_free(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter("event_type = 'click'").select("user_id", "ts", "value")
    out = link_asof(left, right, on="user_id")
    assert out.count() == left.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scale claim: ONE key shuffle, no join node anywhere
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_cep_literal_first_b_and_horizon(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, _ts(0), "A"),
            (1, 2, _ts(5), "B"),   # first B for a=1
            (1, 3, _ts(7), "B"),
            (1, 4, _ts(6), "A"),   # its first B is id 3 (ts 7)
            (2, 5, _ts(0), "A"),
            (2, 6, _ts(31), "B"),  # outside 30-min horizon → no match
            (3, 7, _ts(3), "B"),   # B before any A → nothing
        ],
        ["user_id", "event_id", "ts", "event_type"],
    )
    got = {
        r["a_id"]: (r["b_id"], r["gap_us"])
        for r in cep_followed_by(
            ev, type_a="A", type_b="B", horizon_s=1800
        ).collect()
    }
    assert got == {1: (2, 300_000_000), 4: (3, 60_000_000)}


def test_cep_horizon_boundary_inclusive_exclusive(spark):
    """b.ts == a.ts + horizon matches (inclusive); b.ts == a.ts does not
    (strictly after) — and the bucket explode covers the k+1 edge."""
    ev = spark.createDataFrame(
        [
            (1, 1, _ts(0), "A"),
            (1, 2, _ts(30), "B"),  # exactly horizon away
            (2, 3, _ts(4), "A"),
            (2, 4, _ts(4), "B"),  # simultaneous → not "followed by"
        ],
        ["user_id", "event_id", "ts", "event_type"],
    )
    got = {
        r["a_id"]: r["b_id"]
        for r in cep_followed_by(
            ev, type_a="A", type_b="B", horizon_s=1800
        ).collect()
    }
    assert got == {1: 2}


def test_cep_no_window_in_plan(spark):
    """First-B is a partial-aggregatable min(struct) — hot keys collapse
    map-side; a window over the pair stream would single-thread them."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        cep_followed_by(ev, horizon_s=14400.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_cep_streaming_hardening_parity(spark):
    """With batches arriving in event-time order, first-B only hardens:
    re-running the batch op over everything-seen after each trigger gives
    prefixes that never contradict earlier matches (the stream-stream-join
    + min-state deployment contract)."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter("event_type IN ('view','purchase')")
    )
    day = F.dayofmonth("ts")
    batches = [ev.filter(day <= 10), ev.filter(day <= 20), ev]
    prev: dict = {}
    for b in batches:
        cur = {
            r["a_id"]: r["b_id"]
            for r in cep_followed_by(b, horizon_s=14400.0).collect()
        }
        for a_id, b_id in prev.items():
            assert cur[a_id] == b_id  # an established match never changes
        prev = cur
