"""Temporal link operators: distributed as-of link and CEP follow-pattern.

Two ops the reference calculus lacks but that its own streaming framing
(Bistro Streams: event tables + link columns, ``server/`` module) begs
for, and that every event-analytics pipeline at scale needs:

- :func:`link_asof` — a **link column into the past**: for each left row,
  the most recent right row of the same key with ``right.ts <= left.ts``
  (optionally within a staleness horizon). Bistro's link
  (``core/.../ColumnDefinitionLink.java#evaluate``) is exact-equality
  only; as-of is its temporal generalization. Spark has no native as-of
  join; the scale-correct plan is JOIN-FREE: union both sides with a
  side tag, ONE shuffle on the key, and a running ``last(payload,
  ignorenulls)`` window — cost is one sort-shuffle of left+right,
  never a per-pair candidate explosion, and skew follows the key's
  event-time order so AQE's skew handling applies to the single
  exchange. (A broadcast-range variant is not generally possible: the
  right side is fact-scale.)

- :func:`cep_followed_by` — the canonical CEP detection "A followed by B
  within *t*" per key: for each A event, the FIRST B event with
  ``a.ts < b.ts <= a.ts + horizon``. Implemented as a time-BUCKETED
  equi-join (bucket width = horizon, A probes its own and the next
  bucket) so candidate pairs are bounded by events-per-2-horizons, not
  events-per-key-squared; first-B selection is a partial-aggregatable
  ``min(struct(ts, id))`` — no window function, so hot keys collapse
  map-side. The streaming twin of the pairing is
  ``streaming.join.stream_stream_link`` (watermark-bounded state);
  first-B hardens monotonically when batches arrive in event-time order
  (parity pytest-pinned).

All comparisons run on integer microseconds (``unix_micros``) — no float
time arithmetic, and the DuckDB oracles mirror via ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def link_asof(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    bring: tuple[str, ...] = ("value",),
    horizon_s: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """As-of link: every ``left`` row gains the ``bring`` columns of the
    latest ``right`` row of the same key with ``right.ts <= left.ts``
    (ties at equal ts take the right row — inclusive as-of; among equal-ts
    right rows the max payload struct wins, deterministically). A miss —
    no prior right row, or the match older than ``horizon_s`` seconds —
    yields nulls, the link-column miss semantics.

    Plan: tag-union → one shuffle on the key → running
    ``last(ignorenulls)`` frame. No join node at all; the left row set
    and order are preserved exactly. Output = all left columns +
    ``<prefix><bring-col>...`` + ``<prefix>ts`` (the matched right ts).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_fields = [F.col(right_ts).cast("timestamp").alias("_rts")] + [
        F.col(c).alias(c) for c in bring
    ]
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("timestamp").alias("_ats"),
        F.lit(0).alias("_tag"),
        F.struct(*payload_fields).alias("_p"),
    )
    lrow_t = T.StructType(left.schema.fields)
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).cast("timestamp").alias("_ats"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(dict(r.dtypes)["_p"]).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    u = l.unionByName(
        r.withColumn("_lrow", F.lit(None).cast(lrow_t)), allowMissingColumns=False
    )
    # rights sort before lefts at equal ts (_tag 0 < 1) ⇒ inclusive as-of;
    # among equal-ts rights the payload struct breaks the tie
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), F.col("_tag").asc(), F.col("_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if horizon_s is not None:
        fresh = F.unix_micros(F.col("_m._rts")) >= F.unix_micros(
            F.col("_ats")
        ) - int(round(horizon_s * 1_000_000))
        matched = matched.withColumn(
            "_m", F.when(fresh, F.col("_m"))
        )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in bring]
    out_cols.append(F.col("_m._rts").alias(f"{prefix}ts"))
    return matched.select(*out_cols)


def cep_followed_by(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    type_a: str = "view",
    type_b: str = "purchase",
    horizon_s: float = 600.0,
) -> DataFrame:
    """Detect "``type_a`` followed by ``type_b`` within ``horizon_s``
    seconds" per key; for each A event emit its FIRST such B:
    ``(key, a_id, a_ts, b_id, b_ts, gap_us)`` (matches only — A events
    with no B in the horizon produce no row).

    First-B = min over (b_ts, b_id) — deterministic under ts ties. The
    join is bucketed by ``horizon`` so a key's candidate pairs are
    bounded by its events within two horizon widths; a fully unbucketed
    per-key self-join would be quadratic in per-key event count (fatal
    for hot keys at 100 TB). Each B lives in exactly one bucket and each
    A probes two, so no pair is generated twice.
    """
    h_us = int(round(horizon_s * 1_000_000))
    a = events.filter(F.col(type_col) == type_a).select(
        F.col(key),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).cast("timestamp").alias("a_ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_aus"),
    )
    b = events.filter(F.col(type_col) == type_b).select(
        F.col(key),
        F.col(id_col).alias("b_id"),
        F.col(ts_col).cast("timestamp").alias("b_ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_bus"),
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(h_us))
        .cast("long")
        .alias("_bk"),
    )
    a_probe = a.withColumn(
        "_bk",
        F.explode(
            F.array(
                (F.col("_aus") / F.lit(h_us)).cast("long"),
                (F.col("_aus") / F.lit(h_us)).cast("long") + 1,
            )
        ),
    )
    pairs = a_probe.join(b, [key, "_bk"]).filter(
        (F.col("_bus") > F.col("_aus"))
        & (F.col("_bus") <= F.col("_aus") + F.lit(h_us))
    )
    first_b = pairs.groupBy(key, "a_id", "a_ts", "_aus").agg(
        F.min(F.struct(F.col("_bus"), F.col("b_id"), F.col("b_ts"))).alias(
            "_fb"
        )
    )
    return first_b.select(
        F.col(key),
        "a_id",
        "a_ts",
        F.col("_fb.b_id").alias("b_id"),
        F.col("_fb.b_ts").alias("b_ts"),
        (F.col("_fb._bus") - F.col("_aus")).cast("long").alias("gap_us"),
    )


# -------------------------------------------------------- sessionization ----
def sessionize(
    df: DataFrame,
    gap_s: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): split each key's event
    stream into maximal runs where consecutive events are ≤ ``gap_s``
    apart, and report one row per session. The batch mirror of the
    session window (`streaming/windows.py`) and the analytics query
    behind every DAU/engagement report.

    Plan shape at 100 TB: ONE shuffle total — the lag flag and the
    running session index are two window passes over the SAME
    (key, ts, id) sort order (no second exchange), and the per-session
    groupBy's (key, session_idx) clustering is satisfied by the existing
    hash partitioning on key, so Catalyst adds no exchange there either.
    Per-key data must fit a partition (the inherent window constraint —
    same note as the as-of link); AQE skew handling applies to the one
    exchange. Time arithmetic is integer microseconds; the value sum is
    decimal-cast (exact, order-independent) and emitted as double.

    Returns (key, session_idx, session_start, session_end, n_events,
    duration_s, sum_value) with session_idx 1-based per key in time
    order."""
    gap_us = int(round(gap_s * 1_000_000))
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lag_us = F.lag(us).over(w)
    new_sess = F.when(
        lag_us.isNull() | (us - lag_us > F.lit(gap_us)), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(val_col),
        F.sum(new_sess).over(run).cast("long").alias("session_idx"),
    )
    return (
        flagged.groupBy(key_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                (
                    F.unix_micros(F.max(ts_col).cast("timestamp"))
                    - F.unix_micros(F.min(ts_col).cast("timestamp"))
                )
                / F.lit(1_000_000.0),
                6,
            ).alias("duration_s"),
            F.round(
                F.sum(F.col(val_col).cast("decimal(30,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
    )


def sessionize_sql(
    table: str = "events",
    gap_s: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
) -> str:
    """DuckDB twin of :func:`sessionize` — the textbook gaps-and-islands
    lag + cumulative-sum formulation on ``epoch_us``."""
    gap_us = int(round(gap_s * 1_000_000))
    return f"""
      WITH lagged AS (
        SELECT {key_col}, {ts_col}, {id_col}, {val_col},
               CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
                         OR epoch_us({ts_col})
                            - lag(epoch_us({ts_col})) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_sess
        FROM {table}
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})
      ),
      runs AS (
        SELECT *,
               CAST(sum(new_sess) OVER (
                 PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM lagged
      )
      SELECT {key_col}, session_idx,
             min({ts_col}) AS session_start,
             max({ts_col}) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events,
             round((epoch_us(max({ts_col})) - epoch_us(min({ts_col})))
                   / 1000000.0, 6) AS duration_s,
             round(CAST(sum(CAST({val_col} AS DECIMAL(30,6))) AS DOUBLE), 6)
               AS sum_value
      FROM runs
      GROUP BY {key_col}, session_idx
    """


# -------------------------------------------- event transition matrix ----
def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event streams:
    for every consecutive pair of events of the same key (time order),
    count (from_type → to_type) and report each row's share among its
    from_type's outgoing transitions. The behavioral-analytics companion
    to :func:`cep_followed_by` (which detects ONE pattern; this reports
    ALL adjacent-pair structure).

    100 TB shape: the lag window shares sessionize's single key shuffle
    (per-key data in one partition — the inherent window constraint,
    AQE skew handling on the one exchange), then ONE partial-aggregated
    groupBy whose output is bounded by #event-types² — report-sized, not
    corpus-sized. Counts exact BIGINT; the probability is a round-6
    report column.

    Returns (from_type, to_type, n_transitions, p)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    pairs = (
        df.select(
            F.lag(F.col(type_col)).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    out = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(out), 6
        ).alias("p"),
    )


def transition_matrix_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`transition_matrix`."""
    return f"""
      WITH lagged AS (
        SELECT lag({type_col}) OVER (
                 PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
               ) AS from_type,
               {type_col} AS to_type
        FROM {table}
      ),
      cnt AS (
        SELECT from_type, to_type,
               CAST(count(*) AS BIGINT) AS n_transitions
        FROM lagged WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
      )
      SELECT from_type, to_type, n_transitions,
             round(CAST(n_transitions AS DOUBLE)
                   / sum(n_transitions) OVER (PARTITION BY from_type), 6)
               AS p
      FROM cnt
    """


# --------------------------------------------------- cohort retention ----
def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by first-seen
    week; for each (cohort, weeks-since) cell, how many of the cohort
    were active. The classic engagement report, in the exact integer
    week arithmetic both engines agree on (week = epoch_µs // (7·86400·10⁶)
    — no calendar/locale week-start disputes).

    100 TB shape: distinct (key, week) activity and the per-key min week
    are two partial-aggregated passes keyed on the SAME column, their
    equi-join stays co-partitioned (no third shuffle of fact data), and
    the final rollup is triangle-bounded (#weeks²/2 rows — report-sized).
    Counts exact BIGINT; retention is a round-6 report column.

    Returns (cohort_week, week_index, n_active, cohort_size, retention);
    week_index 0 is the cohort's own week (retention 1.0 by definition
    only when every cohort user is active that week — which week 0 is)."""
    wk = (
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(604_800_000_000))
    ).cast("long")
    activity = df.select(F.col(key_col), wk.alias("week")).distinct()
    cohorts = activity.groupBy(key_col).agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        activity.join(cohorts, key_col)
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_index"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        F.col("week_index").cast("long").alias("week_index"),
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def cohort_retention_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`cohort_retention` (same integer epoch-week)."""
    return f"""
      WITH activity AS (
        SELECT DISTINCT {key_col} AS k,
               CAST(epoch_us({ts_col}) // 604800000000 AS BIGINT) AS week
        FROM {table}
      ),
      cohorts AS (
        SELECT k, min(week) AS cohort_week FROM activity GROUP BY k
      ),
      sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        FROM cohorts GROUP BY cohort_week
      ),
      cells AS (
        SELECT c.cohort_week, a.week - c.cohort_week AS week_index,
               CAST(count(*) AS BIGINT) AS n_active
        FROM activity a JOIN cohorts c USING (k)
        GROUP BY 1, 2
      )
      SELECT cells.cohort_week,
             CAST(week_index AS BIGINT) AS week_index,
             n_active, cohort_size,
             round(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
      FROM cells JOIN sizes USING (cohort_week)
    """


# ------------------------------------------------ expanding z-score ----
def expanding_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    min_prev: int = 2,
) -> DataFrame:
    """Per-event anomaly score against the key's OWN history: z = (x − μ)
    / σ over all strictly-prior events of the same key (expanding window,
    exclusive of the current row). Prior-exclusive is the deliberate
    choice — it is the only form an exactly-once streaming scorer can
    reproduce (the score of an event never changes after emission), and
    it is the honest one (the current point must not dilute its own
    baseline).

    100 TB shape: ONE key shuffle; the three running statistics
    (count, Σx, Σx²) are cumulative window sums over the same
    (key, ts, id) sort order — no second exchange, no self-join. Float
    discipline: x is cast once to decimal(30,6), both running sums stay
    exact decimal, and z is assembled in ONE final double expression
    (round-6) — partitioning cannot change a single emitted score.

    Returns (id, key, ts, value, n_prev, z); z is NULL until ``min_prev``
    prior events exist or while the prior variance is zero."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    xd = F.col(val_col).cast("decimal(30,6)")
    n = F.count(F.lit(1)).over(w).cast("long")
    sx = F.sum(xd).over(w).cast("decimal(38,6)")
    sxx = F.sum((xd * xd).cast("decimal(38,12)")).over(w).cast("decimal(38,12)")
    mean = sx.cast("double") / n
    var = (sxx.cast("double") - sx.cast("double") * sx.cast("double") / n) / n
    z = (F.col(val_col) - mean) / F.sqrt(var)
    return df.select(
        F.col(id_col),
        F.col(key_col),
        F.col(ts_col),
        F.col(val_col),
        F.coalesce(n, F.lit(0)).alias("n_prev"),
        F.round(
            F.when((n >= F.lit(min_prev)) & (var > 0), z), 6
        ).alias("z"),
    )


def expanding_zscore_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    min_prev: int = 2,
) -> str:
    """DuckDB twin of :func:`expanding_zscore` (same exclusive frame and
    decimal-exact running sums)."""
    return f"""
      WITH stats AS (
        SELECT {id_col}, {key_col}, {ts_col}, {val_col},
               count(*) OVER w AS n,
               CAST(sum(CAST({val_col} AS DECIMAL(30,6))) OVER w
                    AS DECIMAL(38,6)) AS sx,
               CAST(sum(CAST(CAST({val_col} AS DECIMAL(30,6))
                             * CAST({val_col} AS DECIMAL(30,6))
                             AS DECIMAL(38,12))) OVER w
                    AS DECIMAL(38,12)) AS sxx
        FROM {table}
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      )
      SELECT {id_col}, {key_col}, {ts_col}, {val_col},
             CAST(coalesce(n, 0) AS BIGINT) AS n_prev,
             round(CASE WHEN n >= {min_prev}
                         AND (CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                             / n > 0
                        THEN ({val_col} - CAST(sx AS DOUBLE) / n)
                             / sqrt((CAST(sxx AS DOUBLE)
                                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                                    / n)
                   END, 6) AS z
      FROM stats
    """


# ---------------------------------------------------- funnel conversion ----
def funnel_conversion(
    df: DataFrame,
    steps: list[str] | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered multi-step funnel: how many keys performed step 1, then
    step 2 strictly after their FIRST step-1 event, then step 3 strictly
    after that, ... (the standard product-analytics funnel, first-touch
    semantics, unbounded horizon — :func:`cep_followed_by` is the
    two-step bounded-horizon cousin).

    "After" is total-order on (ts, id) via struct comparison, so same-µs
    ties break identically on every engine and run. Each step is one
    type-pruned pass over the fact table aggregated to per-key min-struct
    (partial-aggregatable), equi-joined to the previous step's survivors
    — all keyed on ``key_col``, so after the first shuffle the joins stay
    co-partitioned, and each step's input only shrinks. No windows, no
    driver-side loops over data (the step list drives plan construction
    only); counts land in ONE lazy union plan.

    Returns (step, n_keys, conversion) — conversion is the share of
    step-1 keys surviving through this step (round-6; step 1 ⇒ 1.0)."""
    steps = steps or ["view", "click", "purchase"]
    mark = F.struct(F.col(ts_col), F.col(id_col)).alias("_m")
    survivors = []  # per step: DataFrame (key, _m) of keys that reached it
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(mark).alias("_m"))
    )
    survivors.append(cur)
    for s in steps[1:]:
        nxt = (
            df.filter(F.col(type_col) == s)
            .join(cur.select(key_col, F.col("_m").alias("_prev")), key_col)
            .filter(F.struct(F.col(ts_col), F.col(id_col)) > F.col("_prev"))
            .groupBy(key_col)
            .agg(F.min(mark).alias("_m"))
        )
        survivors.append(nxt)
        cur = nxt
    counts = None
    for i, (s, d) in enumerate(zip(steps, survivors)):
        c = d.agg(F.count(F.lit(1)).cast("long").alias("n_keys")).select(
            F.lit(f"{i + 1}_{s}").alias("step"), "n_keys"
        )
        counts = c if counts is None else counts.unionByName(c)
    base = (
        survivors[0]
        .agg(F.count(F.lit(1)).cast("long").alias("_n1"))
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "step",
        "n_keys",
        F.round(F.col("n_keys") / F.col("_n1"), 6).alias("conversion"),
    )


def funnel_conversion_sql(
    table: str = "events",
    steps: list[str] | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_conversion` (struct min + row
    comparison have the same lexicographic semantics)."""
    steps = steps or ["view", "click", "purchase"]
    ctes = [
        f"""s1 AS (
        SELECT {key_col} AS k,
               min({{'ts': {ts_col}, 'id': {id_col}}}) AS m
        FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY {key_col}
      )"""
    ]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"""s{i} AS (
        SELECT e.{key_col} AS k,
               min({{'ts': e.{ts_col}, 'id': e.{id_col}}}) AS m
        FROM {table} e JOIN s{i - 1} p ON e.{key_col} = p.k
        WHERE e.{type_col} = '{s}'
          AND {{'ts': e.{ts_col}, 'id': e.{id_col}}} > p.m
        GROUP BY e.{key_col}
      )"""
        )
    selects = "\n      UNION ALL\n".join(
        f"      SELECT '{i + 1}_{s}' AS step,"
        f" CAST(count(*) AS BIGINT) AS n_keys FROM s{i + 1}"
        for i, s in enumerate(steps)
    )
    return f"""
      WITH {", ".join(ctes)},
      counts AS (
{selects}
      ),
      base AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM s1)
      SELECT step, n_keys,
             round(CAST(n_keys AS DOUBLE) / n1, 6) AS conversion
      FROM counts CROSS JOIN base
    """


# ------------------------------------------------- hour-of-week load ----
def load_heatmap(
    df: DataFrame,
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Operational load heatmap: event count and exact value sum per
    (day-of-week, hour-of-day) cell — the capacity-planning view of any
    event stream. Time math is pure integer epoch arithmetic
    (hour = µs // 3600·10⁶ mod 24; dow = (µs // 86400·10⁶ + 4) mod 7,
    0 = Sunday — the 1970-01-01-was-Thursday shift), so no engine's
    calendar/locale/timezone layer is consulted at all.

    ONE partial-aggregated groupBy to a ≤168-row output; sums exact
    decimal → round-6 double report. Returns (dow, hour, n_events,
    sum_value)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        df.select(
            # integer DIV, not float /: epoch-boundary µs must never
            # round across a day/hour edge
            us.alias("_us"),
            F.col(val_col),
        )
        .select(
            (F.expr("_us DIV 86400000000") + F.lit(4)).alias("_d"),
            F.expr("_us DIV 3600000000").alias("_h"),
            F.col(val_col),
        )
        .groupBy(
            (F.col("_d") % 7).cast("long").alias("dow"),
            (F.col("_h") % 24).cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum(F.col(val_col).cast("decimal(30,6)")).cast("double"), 6
            ).alias("sum_value"),
        )
    )


def load_heatmap_sql(table: str = "events", ts_col: str = "ts",
                     val_col: str = "value") -> str:
    """DuckDB twin of :func:`load_heatmap` (same integer epoch math)."""
    return f"""
      SELECT CAST((epoch_us({ts_col}) // 86400000000 + 4) % 7 AS BIGINT)
               AS dow,
             CAST((epoch_us({ts_col}) // 3600000000) % 24 AS BIGINT)
               AS hour,
             CAST(count(*) AS BIGINT) AS n_events,
             round(CAST(sum(CAST({val_col} AS DECIMAL(30,6))) AS DOUBLE), 6)
               AS sum_value
      FROM {table}
      GROUP BY 1, 2
    """


# -------------------------------------- calendar-spine gap-fill growth ----
def activity_spine(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """Gap-filled daily activity series per event type with day-over-day
    growth — the calendar-spine OLAP pattern. A raw groupBy(day) silently
    DROPS empty days, so growth rates computed from it are wrong exactly
    when the signal matters (an outage day); the spine join restores the
    zeros before the lag.

    100 TB shape: the fact table is touched by ONE partial-aggregated
    groupBy to the (type, day) grid — bounded by #types x #days, report-
    sized no matter the corpus. Everything after runs on that grid: the
    (min, max) day bound is a 1-row agg OVER THE GRID (not a second fact
    scan), the spine is a ``sequence()`` explode of integer epoch-days
    cross-joined with the distinct types (both provably grid-sized), and
    the daily grid is explicitly ``broadcast()`` onto the spine — its
    size bound makes the hint safe by construction, unlike a stats
    guess. The growth lag windows over the spine partitioned BY TYPE, so
    no single-reducer global window exists anywhere in the plan.

    Integer epoch-day math with FLOOR semantics (no calendar layer):
    Spark's ``DIV`` and DuckDB's integer ``//`` BOTH truncate toward
    zero, which puts 1969-12-31 23:00 in day 0 — the negative-µs
    correction term below (mirrored in the SQL twin) floors instead, so
    pre-1970 timestamps bin to the calendar-correct day. Exact
    decimal value sums; growth is a round-6 report ratio of exact
    BIGINTs. Returns (event_type, day, n_events, sum_value, prev_events,
    dod_pct) with dod_pct NULL on the first day and after zero days
    (division by an empty day is reported as NULL, not Inf)."""
    us = f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
    daily = (
        df.select(
            F.col(type_col).alias("event_type"),
            F.expr(
                f"({us} DIV 86400000000)"
                f" - (CASE WHEN {us} % 86400000000 < 0 THEN 1 ELSE 0 END)"
            ).alias("day"),
            F.col(val_col).alias("_v"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(F.col("_v").cast("decimal(30,6)")).alias("_sv"),
        )
    )
    bounds = daily.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    days = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
    )
    types = daily.select("event_type").distinct()
    spine = types.crossJoin(days)
    filled = spine.join(
        F.broadcast(daily), ["event_type", "day"], "left"
    ).select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.round(
            F.coalesce(F.col("_sv"), F.lit(0).cast("decimal(30,6)"))
            .cast("double"),
            6,
        ).alias("sum_value"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n_events").over(w)
    return filled.select(
        "event_type",
        "day",
        "n_events",
        "sum_value",
        prev.cast("long").alias("prev_events"),
        F.when(
            prev > 0,
            F.round((F.col("n_events") - prev) / prev, 6),
        ).alias("dod_pct"),
    )


def activity_spine_sql(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "value",
) -> str:
    """DuckDB twin of :func:`activity_spine` (generate_series spine,
    same integer epoch-day math). DuckDB's integer ``//`` truncates
    toward zero just like Spark's ``DIV``, so BOTH engines carry the
    same negative-µs floor correction — day bins are calendar-correct
    (floored) for pre-1970 timestamps on both sides."""
    return f"""
      WITH daily AS (
        SELECT {type_col} AS event_type,
               CAST(epoch_us({ts_col}) // 86400000000
                    - CASE WHEN epoch_us({ts_col}) % 86400000000 < 0
                           THEN 1 ELSE 0 END AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST({val_col} AS DECIMAL(30,6))) AS sv
        FROM {table} GROUP BY 1, 2
      ),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      spine AS (
        SELECT t.event_type, CAST(gs.d AS BIGINT) AS day
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS d FROM b) gs
      ),
      filled AS (
        SELECT s.event_type, s.day,
               coalesce(d.n, 0) AS n_events,
               round(CAST(coalesce(d.sv, CAST(0 AS DECIMAL(30,6)))
                          AS DOUBLE), 6) AS sum_value
        FROM spine s
        LEFT JOIN daily d
          ON s.event_type = d.event_type AND s.day = d.day
      )
      SELECT event_type, day, n_events, sum_value,
             CAST(lag(n_events) OVER w AS BIGINT) AS prev_events,
             CASE WHEN lag(n_events) OVER w > 0
                  THEN round((n_events - lag(n_events) OVER w)
                             / CAST(lag(n_events) OVER w AS DOUBLE), 6)
             END AS dod_pct
      FROM filled
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """


# ---------------------------------------------------------------------------
# watermark audit: choosing the watermark delay from data
# ---------------------------------------------------------------------------


def watermark_audit(
    df: DataFrame,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    n_batches: int = 20,
    delays_s: tuple[int, ...] = (0, 86400, 604800, 1296000, 2592000),
) -> DataFrame:
    """How many events would a streaming job DROP as late, for each
    candidate watermark delay? The number that decides the
    ``withWatermark`` setting: too small silently loses data, too large
    bloats every stateful operator's store.

    Arrival model: triggers are md5 buckets of the arrival key (batch
    index = arrival order) — a deterministic stand-in for an
    out-of-order stream where every trigger carries a sample of event
    times. Spark semantics are mirrored exactly: the watermark applied
    to trigger ``t`` is ``max(event ts seen through trigger t-1) -
    delay``, so batch 0 can never drop (no watermark yet), and an event
    is late iff its ts (integer microseconds — no float time math) is
    below its own trigger's watermark.

    Scale design: one partial-agg shuffle reduces the corpus to
    #batches maxima; the running max is a window over that tiny grid;
    the grid broadcasts back; then ONE corpus pass evaluates ALL delay
    candidates simultaneously as parallel conditional sums (the delay
    grid multiplies agg columns, not rows — the oracle's corpus×grid
    cross join is the definitional formulation only).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    batch = (
        F.conv(
            F.substring(F.md5(F.col(arrival_col).cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % int(n_batches)
    )
    e = df.select(batch.alias("batch"), us.alias("us"))
    grid = e.groupBy("batch").agg(F.max("us").alias("mx"))
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -1)
    wm = grid.select("batch", F.max("mx").over(w).alias("wm_base"))
    m = e.join(F.broadcast(wm), "batch")
    aggs = [F.count("*").cast("long").alias("n_events")]
    for d in delays_s:
        d_us = int(d) * 1_000_000
        aggs.append(
            F.sum(
                F.when(
                    F.col("wm_base").isNotNull()
                    & (F.col("us") < F.col("wm_base") - F.lit(d_us)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"late_{int(d)}")
        )
    row = m.agg(*aggs)
    stack = ", ".join(f"{int(d)}L, late_{int(d)}" for d in delays_s)
    return row.select(
        F.expr(f"stack({len(delays_s)}, {stack}) AS (delay_s, n_late)"),
        "n_events",
    ).select(
        "delay_s",
        "n_events",
        "n_late",
        F.round(F.col("n_late") / F.col("n_events"), 9).alias("frac_late"),
    )


def watermark_audit_sql(
    table: str = "events",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    n_batches: int = 20,
    delays_s: tuple[int, ...] = (0, 86400, 604800, 1296000, 2592000),
) -> str:
    """DuckDB twin of :func:`watermark_audit` — the definitional
    corpus×grid cross join."""
    grid = ", ".join(str(int(d)) for d in delays_s)
    late = (
        "CASE WHEN m.wm_base IS NOT NULL "
        "AND m.us < m.wm_base - d.delay_s * 1000000 THEN 1 ELSE 0 END"
    )
    return f"""
      WITH e AS (
        SELECT CAST(concat('0x',
                 substr(md5(CAST({arrival_col} AS VARCHAR)), 1, 8))
               AS BIGINT) % {int(n_batches)} AS batch,
               epoch_us({ts_col}) AS us
        FROM {table}
      ),
      b AS (SELECT batch, max(us) AS mx FROM e GROUP BY batch),
      w AS (
        SELECT batch,
               max(mx) OVER (ORDER BY batch
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS wm_base
        FROM b
      ),
      m AS (SELECT e.us, w.wm_base FROM e JOIN w USING (batch)),
      d AS (SELECT CAST(unnest([{grid}]) AS BIGINT) AS delay_s)
      SELECT d.delay_s,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum({late}) AS BIGINT) AS n_late,
             round(CAST(sum({late}) AS DOUBLE) / count(*), 9) AS frac_late
      FROM m CROSS JOIN d
      GROUP BY d.delay_s
    """
