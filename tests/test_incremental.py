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
