"""Executor-storage lifecycle for pinned intermediates.

Several operators materialize an intermediate with ``localCheckpoint``
(connected-components rounds, ``global_rank``'s range-partitioned table,
the shared dedup cluster assignment): the blocks are pinned in executor
storage and — unlike ``persist()`` — a local checkpoint TRUNCATES
lineage, so a released block can never be recomputed. Spark exposes no
DataFrame-level release for them; the blocks live until the session
dies. On a long-lived session (a bench suite, a streaming driver, a
notebook) that is a leak: round-3 measurements showed queries running
after the dedup family paying 1.9-3.7x in GC pressure from blocks
nobody would ever read again.

This module tracks pinned RDD ids via ``SparkContext.getPersistentRDDs``
(public Scala API, reached through the JVM gateway — classic mode only,
not Spark Connect) and releases them once their last consumer is done:

- :func:`pin` — ``localCheckpoint(eager=True)`` + return the newly
  pinned RDD ids so the caller can release them explicitly; ``keep=True``
  exempts them from scope-based release (for cross-query shared caches).
- :func:`pin_scope` — context manager: snapshot pinned ids on entry,
  release everything newly pinned on exit (except keep-pinned). Wrap
  each independent query execution in one; any ``localCheckpoint``
  created inside — by this module or not — is freed at exit.
- :func:`release` — free a specific id set (the keep-cache's hook).

CAUTION: a released checkpoint CANNOT be recomputed (the executor raises
``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND``) — only release after every
consumer has fully executed. The id-diff bookkeeping assumes one thread
pins at a time (true for the bench/contract drivers; concurrent jobs
should pass explicit ids from :func:`pin`).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

# ids exempt from scope-based release: shared caches that outlive one query
_KEEP: set[int] = set()


def _jmap(spark: SparkSession):
    return spark.sparkContext._jsc.getPersistentRDDs()


def pinned_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently pinned in executor storage (cached,
    persisted, or local-checkpointed)."""
    return {int(k) for k in _jmap(spark).keySet().toArray()}


def pin(df: DataFrame, keep: bool = False) -> tuple[DataFrame, set[int]]:
    """``localCheckpoint(eager=True)`` with tracked block ownership.

    Returns ``(checkpointed_df, pinned_rdd_ids)``; pass the ids to
    :func:`release` after the last consumer finishes. ``keep=True``
    registers the ids as scope-exempt (shared cross-query caches that an
    explicit release hook frees instead)."""
    spark = df.sparkSession
    before = pinned_ids(spark)
    out = df.localCheckpoint(eager=True)
    ids = pinned_ids(spark) - before
    if keep:
        _KEEP.update(ids)
    return out, ids


def release(spark: SparkSession, ids: set[int]) -> int:
    """Free the given pinned RDD ids (no-op for ids already gone).
    Returns the number of RDDs released."""
    jm = _jmap(spark)
    n = 0
    for k in list(jm.keySet().toArray()):
        ik = int(k)
        if ik in ids:
            jm.get(k).unpersist(False)
            _KEEP.discard(ik)
            n += 1
    return n


def release_new_pins(
    spark: SparkSession, before: set[int], exclude: set[int] = frozenset()
) -> int:
    """Free every RDD pinned since ``before`` was snapshotted, except
    keep-pinned ids and ``exclude`` (ids the caller still owns — e.g. the
    output checkpoint it is about to hand downstream). Returns the number
    released."""
    jm = _jmap(spark)
    n = 0
    for k in list(jm.keySet().toArray()):
        ik = int(k)
        if ik not in before and ik not in _KEEP and ik not in exclude:
            jm.get(k).unpersist(False)
            n += 1
    return n


@contextmanager
def pin_scope(spark: SparkSession):
    """Scope whose pinned intermediates are freed on exit.

    Wrap one fully-executed query (plan built AND collected inside): on
    exit, every block pinned during the scope — localCheckpoints from
    ``global_rank``, CC rounds, candidate materializations — is
    released. Do NOT let a lazy DataFrame built inside escape and
    execute later: its checkpointed inputs will be gone."""
    before = pinned_ids(spark)
    try:
        yield
    finally:
        release_new_pins(spark, before)
