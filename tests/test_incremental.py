"""Incremental (foreachBatch-mode) parity tests — the Bistro Streams action
loop twin (SURVEY.md §7.3): scripted micro-batches, add-only state merge,
count-based FIFO retention (ActionRemove max-length), age-based retention
(ActionRemove max-age). Oracle = recompute over the retained population,
which is exactly the reference's semantics (evaluate reflects current table
contents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bistro_spark.pipeline import prepare_facts
from bistro_spark.sources.tokens import token_table_fast
from bistro_spark.streaming.incremental import AggSpec, IncrementalRunner

N = 1000
SPLITS = [100, 400, 50, 450]  # uneven on purpose (FIXTURES.md F3)

AGGS = [
    AggSpec("n_seq", "count(*)", "sum", 0),
    AggSpec("sum_tok", "sum(n_tok_calc)", "sum", 0),
    AggSpec("max_tok", "max(n_tok_calc)", "max", 0),
]


@pytest.fixture(scope="module")
def batches(spark):
    full = token_table_fast(spark, N).cache()
    full.count()
    out, lo = [], 0
    for size in SPLITS:
        out.append(full.filter((F.col("batch_ofs") >= lo) & (F.col("batch_ofs") < lo + size)))
        lo += size
    return full, out


def _res(runner):
    return {r["src"]: r.asDict() for r in runner.result().collect()}


def test_incremental_addonly_equals_batch(spark, batches):
    """Merged per-batch aggregates == one-shot batch aggregation (the
    delta-driven evaluation invariant, Schema.java#evaluate over spans)."""
    full, parts = batches
    runner = IncrementalRunner(
        spark, lambda b: prepare_facts(spark, b), ["src"], AGGS
    )
    for b in parts:
        runner.add_batch(b)
    got = _res(runner)

    oracle = {
        r["src"]: r.asDict()
        for r in prepare_facts(spark, full)
        .groupBy("src")
        .agg(
            F.expr("count(*)").alias("n_seq"),
            F.expr("sum(n_tok_calc)").alias("sum_tok"),
            F.expr("max(n_tok_calc)").alias("max_tok"),
        )
        .collect()
    }
    assert got.keys() == oracle.keys()
    for k in oracle:
        assert got[k] == oracle[k], k


def test_incremental_intermediate_states(spark, batches):
    """State trajectory: after each batch the result equals recomputation
    over the prefix — matching Bistro's evaluate-after-every-add."""
    full, parts = batches
    runner = IncrementalRunner(
        spark, lambda b: prepare_facts(spark, b), ["src"], AGGS
    )
    seen = 0
    for b, size in zip(parts, SPLITS):
        runner.add_batch(b)
        seen += size
        got = _res(runner)
        oracle = {
            r["src"]: r.asDict()
            for r in prepare_facts(
                spark, full.filter(F.col("batch_ofs") < seen)
            )
            .groupBy("src")
            .agg(
                F.expr("count(*)").alias("n_seq"),
                F.expr("sum(n_tok_calc)").alias("sum_tok"),
                F.expr("max(n_tok_calc)").alias("max_tok"),
            )
            .collect()
        }
        assert got == oracle, f"prefix {seen}"


def test_incremental_count_retention(spark, batches):
    """FIFO max-length retention (ActionRemove count variant): state equals
    recompute over the newest 300 rows by arrival order."""
    full, parts = batches
    runner = IncrementalRunner(
        spark,
        lambda b: prepare_facts(spark, b),
        ["src"],
        AGGS,
        retention_count=300,
    )
    for b in parts:
        runner.add_batch(b)
    got = _res(runner)

    oracle = {
        r["src"]: r.asDict()
        for r in prepare_facts(
            spark, full.filter(F.col("batch_ofs") >= N - 300)
        )
        .groupBy("src")
        .agg(
            F.expr("count(*)").alias("n_seq"),
            F.expr("sum(n_tok_calc)").alias("sum_tok"),
            F.expr("max(n_tok_calc)").alias("max_tok"),
        )
        .collect()
    }
    assert got == oracle
    assert runner.window().count() == 300


def test_incremental_age_retention(spark, batches):
    """Age-based retention (ActionRemove max-age / watermark analog):
    rows older than 60 s behind the max event time are evicted.

    event_time = t0 + i*250ms, so 60 s spans the last 240 rows
    (strict > cutoff excludes the row exactly 60 s old)."""
    full, parts = batches
    runner = IncrementalRunner(
        spark,
        lambda b: prepare_facts(spark, b),
        ["src"],
        AGGS,
        retention_age="60 seconds",
    )
    for b in parts:
        runner.add_batch(b)
    got = _res(runner)

    # max event_time at i=999; cutoff excludes rows with i <= 999-240
    oracle = {
        r["src"]: r.asDict()
        for r in prepare_facts(
            spark, full.filter(F.col("batch_ofs") > N - 1 - 240)
        )
        .groupBy("src")
        .agg(
            F.expr("count(*)").alias("n_seq"),
            F.expr("sum(n_tok_calc)").alias("sum_tok"),
            F.expr("max(n_tok_calc)").alias("max_tok"),
        )
        .collect()
    }
    assert got == oracle
    assert runner.window().count() == 240


UNFOLD_AGGS = [
    AggSpec("n_seq", "count(*)", "sum", 0, invertible=True),
    AggSpec("sum_tok", "sum(n_tok_calc)", "sum", 0, invertible=True),
]


@pytest.mark.parametrize(
    "retention", [{"retention_count": 300}, {"retention_age": "60 seconds"}]
)
def test_incremental_unfold_equals_recompute(spark, batches, retention):
    """Eviction un-fold (state += delta partial − evicted partial) must
    match the recompute fallback after EVERY batch of the scripted
    add/evict sequence — the reference's accu shrink-on-remove parity."""
    full, parts = batches
    unfolded = IncrementalRunner(
        spark, lambda b: prepare_facts(spark, b), ["src"], UNFOLD_AGGS,
        **retention,
    )
    recompute = IncrementalRunner(
        spark, lambda b: prepare_facts(spark, b), ["src"], UNFOLD_AGGS,
        unfold=False, **retention,
    )
    assert unfolded._unfold and not recompute._unfold
    for b in parts:
        unfolded.add_batch(b)
        recompute.add_batch(b)
        got = {r["src"]: r.asDict() for r in unfolded.result().collect()}
        want = {r["src"]: r.asDict() for r in recompute.result().collect()}
        assert got == want


def test_incremental_unfold_readout_plan(spark, batches):
    """Per-batch work ∝ delta: the un-fold read-out is a plain state read —
    its physical plan contains NO aggregation over the retained buffer,
    while the recompute fallback's read-out does."""
    full, parts = batches
    unfolded = IncrementalRunner(
        spark, lambda b: prepare_facts(spark, b), ["src"], UNFOLD_AGGS,
        retention_count=300,
    )
    recompute = IncrementalRunner(
        spark, lambda b: prepare_facts(spark, b), ["src"], UNFOLD_AGGS,
        unfold=False, retention_count=300,
    )
    unfolded.add_batch(parts[0])
    recompute.add_batch(parts[0])
    plan_u = unfolded.result()._jdf.queryExecution().executedPlan().toString()
    plan_r = recompute.result()._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan_u
    assert "Aggregate" in plan_r


def test_incremental_unfold_prunes_dead_groups(spark):
    """A group whose rows are ALL evicted must leave the un-fold state
    entirely (not persist as a __live_rows == 0 tombstone through every
    merge): state size tracks LIVE keys, not all-time distinct keys."""
    mk = lambda src, lo, n: spark.createDataFrame(
        [(src, 10, i) for i in range(lo, lo + n)],
        "src string, n_tok_calc long, batch_ofs long",
    )
    runner = IncrementalRunner(
        spark, lambda b: b, ["src"], UNFOLD_AGGS, retention_count=10
    )
    assert runner._unfold
    runner.add_batch(mk("a", 0, 5))
    runner.add_batch(mk("b", 5, 5))
    runner.add_batch(mk("b", 10, 5))  # evicts ofs 0-4 → group 'a' dead
    assert {r["src"] for r in runner.result().collect()} == {"b"}
    state_keys = {r["src"] for r in runner._state.collect()}
    assert state_keys == {"b"}, state_keys


def test_incremental_unfold_auto_fallback(spark):
    """max() has no inverse → auto mode must fall back to recompute, and
    forcing unfold=True must be rejected."""
    r = IncrementalRunner(
        spark, lambda b: b, ["src"], AGGS, retention_count=10
    )
    assert not r._unfold
    with pytest.raises(ValueError):
        IncrementalRunner(
            spark, lambda b: b, ["src"], AGGS, retention_count=10, unfold=True
        )
