"""CDC changelog application: the exactly-once MERGE primitive.

A streaming ingest that maintains an Iceberg table under exactly-once
semantics is, logically, a changelog fold: every arriving record is an
upsert (``U``) or a delete tombstone (``D``) for some entity key, totally
ordered by a sequence number (commit LSN / event id), and the table's
current snapshot is "the latest non-deleted version of every key".
Iceberg's ``MERGE INTO`` and Spark's ``foreachBatch`` upsert sinks both
implement exactly this; :func:`apply_changelog` computes the snapshot
declaratively so the sink's result can be audited against the log.

Scale design (the reason this is NOT a window query):

- the winner per key is ``max(struct(seq, op, payload...))`` — struct
  ordering is lexicographic and ``seq`` leads, so with unique sequence
  numbers the struct-max IS last-write-wins.  ``max`` is a partial
  aggregate: every map task reduces its slice of the log to one candidate
  row per key before the shuffle, so a 10^12-row changelog with 10^9
  entities shuffles entity-count rows, not log-count rows.  The
  equivalent ``row_number() OVER (PARTITION BY key ORDER BY seq DESC)``
  formulation (which the DuckDB oracle deliberately uses — definitional,
  shares no plan structure) would shuffle the FULL log and sort every
  key group instead.  Plan note: struct-valued aggregation buffers are
  not hash-aggregatable, so Spark plans this as SortAggregate — the
  partial (map-side) aggregate and single entity-keyed exchange are
  unchanged (pytest-pinned); the fallback costs an in-task sort, not a
  bigger shuffle.
- delete handling is a post-aggregation filter on the winner's op: a
  tombstone only removes the key if it is the LAST word.  A late
  lower-seq upsert arriving after the tombstone must not resurrect the
  key — the struct-max gives that for free.
- replay tolerance: ``max`` is idempotent, so an at-least-once delivery
  that re-folds the same log slice leaves the snapshot unchanged (the
  property the streaming twin pins in pytest).

The streaming twin (``streaming/cdc.StreamingUpsertStore``) maintains the
same fold incrementally with per-key state and matches this operator's
output EXACTLY at every trigger in ANY arrival order, because max is
commutative, associative, and idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changelog(
    log_df: DataFrame,
    key_col: str = "entity_id",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: Sequence[str] = ("event_type", "value"),
    delete_op: str = "D",
) -> DataFrame:
    """Fold a CDC changelog into its current snapshot: per key, the
    payload of the highest-``seq`` record, omitted when that record is a
    delete tombstone.  Returns (key, version, *payload) where ``version``
    is the winning sequence number.

    ``seq`` must be unique per key (a commit LSN or globally unique event
    id) — that makes the struct-max deterministic.
    """
    pays = list(payload_cols)
    winner = F.max(
        F.struct(
            F.col(seq_col).cast("long").alias("version"),
            F.col(op_col).alias("op"),
            *[F.col(c).alias(c) for c in pays],
        )
    ).alias("w")
    return (
        log_df.groupBy(key_col)
        .agg(winner)
        .filter(F.col("w.op") != delete_op)
        .select(
            key_col,
            F.col("w.version").alias("version"),
            *[F.col(f"w.{c}").alias(c) for c in pays],
        )
    )


def apply_changelog_sql(
    table: str,
    key_col: str = "entity_id",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: Sequence[str] = ("event_type", "value"),
    delete_op: str = "D",
    extra_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`apply_changelog` — deliberately the
    definitional ``row_number`` formulation (latest row per key, drop
    tombstones), sharing no plan structure with the struct-max fold."""
    pays = ", ".join(payload_cols)
    return f"""
      WITH {extra_ctes} ranked AS (
        SELECT {key_col},
               CAST({seq_col} AS BIGINT) AS version,
               {op_col} AS op,
               {pays},
               row_number() OVER (
                 PARTITION BY {key_col} ORDER BY {seq_col} DESC
               ) AS rn
        FROM {table}
      )
      SELECT {key_col}, version, {pays}
      FROM ranked
      WHERE rn = 1 AND op <> '{delete_op}'
    """


def changelog_history(
    log_df: DataFrame,
    key_col: str = "entity_id",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: Sequence[str] = ("event_type", "value"),
    delete_op: str = "D",
) -> DataFrame:
    """SCD-type-2 history of the changelog: one validity interval per
    upserted version — ``[seq_from, seq_to)`` where ``seq_to`` is the
    next operation's sequence number for the key (NULL while current) —
    plus ``is_current`` (an open interval not superseded by a delete).
    The time-travel/audit view that complements
    :func:`apply_changelog`'s "latest state" view: joining a fact at
    sequence ``s`` to ``seq_from <= s < seq_to`` reconstructs the
    dimension as of ``s``.

    Scale: version ordering is inherently per-key, so the plan is ONE
    key shuffle with per-key sort (window lead) — rows are touched
    once, tombstones close intervals and then drop out of the output.
    """
    from pyspark.sql import Window

    pays = list(payload_cols)
    w = Window.partitionBy(key_col).orderBy("seq_from")
    ordered = log_df.select(
        key_col,
        F.col(seq_col).cast("long").alias("seq_from"),
        F.col(op_col).alias("op"),
        *pays,
    ).withColumn("seq_to", F.lead("seq_from").over(w))
    return (
        ordered.filter(F.col("op") != delete_op)
        .select(
            key_col,
            "seq_from",
            "seq_to",
            F.col("seq_to").isNull().alias("is_current"),
            *pays,
        )
    )


def changelog_history_sql(
    table: str,
    key_col: str = "entity_id",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: Sequence[str] = ("event_type", "value"),
    delete_op: str = "D",
    extra_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`changelog_history`."""
    pays = ", ".join(payload_cols)
    return f"""
      WITH {extra_ctes} ordered AS (
        SELECT {key_col},
               CAST({seq_col} AS BIGINT) AS seq_from,
               {op_col} AS op,
               {pays},
               lead(CAST({seq_col} AS BIGINT)) OVER (
                 PARTITION BY {key_col} ORDER BY {seq_col}
               ) AS seq_to
        FROM {table}
      )
      SELECT {key_col}, seq_from, seq_to,
             seq_to IS NULL AS is_current,
             {pays}
      FROM ordered
      WHERE op <> '{delete_op}'
    """
