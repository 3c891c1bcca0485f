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
