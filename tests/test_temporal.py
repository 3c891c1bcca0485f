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


# --------------------------------------------------------- sessionization ----


def test_sessionize_hand_computed(spark):
    from datetime import datetime as dt

    from bistro_spark.operators.temporal import sessionize

    rows = [
        # user 1: two sessions (gap 100s splits at t=0..30 vs t=200..210)
        (0, dt(2024, 1, 1, 0, 0, 0), 1, 1.5),
        (1, dt(2024, 1, 1, 0, 0, 30), 1, 2.0),
        (2, dt(2024, 1, 1, 0, 3, 20), 1, 0.25),
        (3, dt(2024, 1, 1, 0, 3, 30), 1, 1.0),
        # user 2: one single-event session
        (4, dt(2024, 1, 1, 0, 0, 10), 2, 9.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    got = {
        (r.user_id, r.session_idx): r
        for r in sessionize(df, gap_s=100.0).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s11 = got[(1, 1)]
    assert (s11.n_events, s11.duration_s, s11.sum_value) == (2, 30.0, 3.5)
    s12 = got[(1, 2)]
    assert (s12.n_events, s12.duration_s, s12.sum_value) == (2, 10.0, 1.25)
    assert got[(2, 1)].duration_s == 0.0


def test_sessionize_gap_boundary_is_inclusive(spark):
    """Events exactly gap_s apart stay in ONE session (<= not <)."""
    from datetime import datetime as dt

    from bistro_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(0, dt(2024, 1, 1, 0, 0, 0), 1, 0.0), (1, dt(2024, 1, 1, 0, 1, 0), 1, 0.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    assert sessionize(df, gap_s=60.0).count() == 1
    assert sessionize(df, gap_s=59.999).count() == 2


def test_sessionize_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.temporal import sessionize, sessionize_sql

    path = "/root/testdata/sf0.001/events.parquet"
    spark_rows = sorted(
        tuple(r)
        for r in sessionize(spark.read.parquet(path), gap_s=1800.0).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r) for r in con.sql(sessionize_sql("events", 1800.0)).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0


# ---------------------------------------------- event transition matrix ----


def test_transition_matrix_hand_computed(spark):
    from datetime import datetime as dt

    from bistro_spark.operators.temporal import transition_matrix

    rows = [
        (0, dt(2024, 1, 1, 0, 0, 0), 1, "view"),
        (1, dt(2024, 1, 1, 0, 0, 10), 1, "view"),
        (2, dt(2024, 1, 1, 0, 0, 20), 1, "buy"),
        (3, dt(2024, 1, 1, 0, 0, 5), 2, "view"),
        (4, dt(2024, 1, 1, 0, 0, 15), 2, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p)
        for r in transition_matrix(df).collect()
    }
    # view->view once, view->buy twice; no cross-user pair (1's buy
    # never links to 2's view)
    assert got == {("view", "view"): (1, round(1 / 3, 6)),
                   ("view", "buy"): (2, round(2 / 3, 6))}


def test_transition_matrix_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.temporal import (
        transition_matrix,
        transition_matrix_sql,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    spark_rows = sorted(
        tuple(r) for r in transition_matrix(spark.read.parquet(path)).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r) for r in con.sql(transition_matrix_sql("events")).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0


# ------------------------------------------------------ cohort retention ----


def test_cohort_retention_hand_computed(spark):
    from datetime import datetime as dt

    from bistro_spark.operators.temporal import cohort_retention

    # epoch-week boundaries: 1970-01-01 is week 0; use +7d offsets.
    w0, w1, w2 = dt(2024, 1, 3), dt(2024, 1, 10), dt(2024, 1, 17)
    rows = [
        (0, w0, 1), (1, w1, 1), (2, w2, 1),   # user 1: weeks 0,1,2
        (3, w0, 2), (4, w2, 2),               # user 2: weeks 0,2
        (5, w1, 3),                           # user 3: cohort w1 only
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        (r.cohort_week, r.week_index): (r.n_active, r.cohort_size, r.retention)
        for r in cohort_retention(df).collect()
    }
    cw = sorted({k[0] for k in got})
    a, b = cw[0], cw[1]
    assert b == a + 1
    assert got[(a, 0)] == (2, 2, 1.0)
    assert got[(a, 1)] == (1, 2, 0.5)
    assert got[(a, 2)] == (2, 2, 1.0)
    assert got[(b, 0)] == (1, 1, 1.0)
    assert set(got) == {(a, 0), (a, 1), (a, 2), (b, 0)}


def test_cohort_retention_matches_duckdb(spark):
    import duckdb

    from bistro_spark.operators.temporal import (
        cohort_retention,
        cohort_retention_sql,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    spark_rows = sorted(
        tuple(r) for r in cohort_retention(spark.read.parquet(path)).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    duck_rows = sorted(
        tuple(r) for r in con.sql(cohort_retention_sql("events")).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0


# ---------------------------------------------------- funnel conversion ----
def test_funnel_order_matters(spark):
    """A key whose click precedes its first view must NOT convert at the
    click step — first-touch ordered semantics, not set-membership."""
    import datetime as dt

    from bistro_spark.operators.temporal import funnel_conversion

    t0 = dt.datetime(2026, 1, 1)
    mk = lambda uid, eid, sec, ty: (uid, t0 + dt.timedelta(seconds=sec), eid, ty)
    rows = [
        # u1: view → click → purchase (full conversion)
        mk(1, 1, 0, "view"), mk(1, 2, 10, "click"), mk(1, 3, 20, "purchase"),
        # u2: click BEFORE view, purchase after — drops at click
        mk(2, 4, 0, "click"), mk(2, 5, 10, "view"), mk(2, 6, 20, "purchase"),
        # u3: view only
        mk(3, 7, 0, "view"),
        # u4: never views — not even in step 1
        mk(4, 8, 0, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r.step: r for r in funnel_conversion(df).collect()}
    assert out["1_view"].n_keys == 3
    assert out["2_click"].n_keys == 1 and out["2_click"].conversion == round(1 / 3, 6)
    assert out["3_purchase"].n_keys == 1


def test_funnel_same_timestamp_tiebreak(spark):
    """Ties at the same µs break on event_id via struct total order —
    a click with the same ts but larger id than the first view counts
    ('after' in the (ts, id) order), same as the DuckDB oracle."""
    import datetime as dt

    from bistro_spark.operators.temporal import funnel_conversion

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 10, "view"),
        (1, t0, 11, "click"),      # same ts, id AFTER the view → counts
        (2, t0, 21, "view"),
        (2, t0, 20, "click"),      # same ts, id BEFORE the view → drops
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r.step: r.n_keys for r in funnel_conversion(df, ["view", "click"]).collect()}
    assert out == {"1_view": 2, "2_click": 1}


# ------------------------------------------------- activity_spine ----
def test_activity_spine_gap_fill_and_growth(spark):
    from bistro_spark.operators.temporal import activity_spine

    # type 'a': day 0 (2 events), day 1 missing, day 2 (1 event);
    # type 'b': a single day — first-row growth must be NULL.
    rows = [
        (datetime(1970, 1, 1, 5), "a", 10.0),
        (datetime(1970, 1, 1, 7), "a", 2.5),
        (datetime(1970, 1, 3, 1), "a", 4.0),
        (datetime(1970, 1, 2, 2), "b", 1.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    got = {
        (r["event_type"], r["day"]): r
        for r in activity_spine(df).collect()
    }
    # spine spans the GLOBAL [min, max] day range for every type
    assert set(got) == {("a", 0), ("a", 1), ("a", 2),
                        ("b", 0), ("b", 1), ("b", 2)}
    assert got[("a", 0)]["n_events"] == 2
    assert got[("a", 0)]["sum_value"] == 12.5
    assert got[("a", 0)]["dod_pct"] is None  # no previous day
    # the gap day exists with explicit zeros
    assert got[("a", 1)]["n_events"] == 0
    assert got[("a", 1)]["sum_value"] == 0.0
    assert got[("a", 1)]["prev_events"] == 2
    assert got[("a", 1)]["dod_pct"] == -1.0  # 2 -> 0
    # growth after a zero day is NULL (no division by the empty day)
    assert got[("a", 2)]["n_events"] == 1
    assert got[("a", 2)]["prev_events"] == 0
    assert got[("a", 2)]["dod_pct"] is None
    # type b: zeros on days it never fired
    assert got[("b", 0)]["n_events"] == 0
    assert got[("b", 1)]["n_events"] == 1


def test_activity_spine_plan_no_global_window(spark):
    """The growth window must be partitioned by type (no single-reducer
    global window) and the fill join must broadcast the daily grid."""
    from bistro_spark.operators.temporal import activity_spine

    df = spark.createDataFrame(
        [(datetime(1970, 1, 1), "a", 1.0)], ["ts", "event_type", "value"]
    )
    plan = activity_spine(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    # every Window operator in the plan carries a partition spec
    for seg in plan.split("Window ")[1:]:
        head = seg.split("\n", 1)[0]
        assert "event_type" in head, head


def test_activity_spine_floors_pre_epoch_days(spark):
    """Day binning floors (DuckDB `//` semantics), so pre-1970
    timestamps land one day DOWN, not truncated toward zero: 1969-12-31
    23:00 is day -1, not day 0."""
    import duckdb

    from bistro_spark.operators.temporal import activity_spine

    df = spark.createDataFrame(
        [
            ("x", "1969-12-31 23:00:00", 1.0),
            ("x", "1970-01-01 01:00:00", 2.0),
            ("x", "1969-12-30 00:00:01", 3.0),
        ],
        "event_type string, ts string, value double",
    ).selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts", "value")
    got = {
        (r["event_type"], r["day"]): r["n_events"]
        for r in activity_spine(df).collect()
    }
    assert got == {("x", -2): 1, ("x", -1): 1, ("x", 0): 1}
    # the SQL twin's corrected expression agrees (raw // truncates to 0)
    from bistro_spark.operators.temporal import activity_spine_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT 'x' AS event_type, ts, value FROM ("
        "VALUES (TIMESTAMP '1969-12-31 23:00:00', 1.0),"
        " (TIMESTAMP '1970-01-01 01:00:00', 2.0),"
        " (TIMESTAMP '1969-12-30 00:00:01', 3.0)) t(ts, value)"
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(activity_spine_sql()).fetchall()
    }
    assert want == {("x", -2): 1, ("x", -1): 1, ("x", 0): 1}
