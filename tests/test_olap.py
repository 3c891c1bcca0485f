"""OLAP reporting operators — semantic pins (margin consistency, decile
population balance, closed-form entropy/correlation values) and the
float-discipline partitioning-invariance check."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bistro_spark.operators.olap import (
    decile_report,
    pivot_report,
    rollup_report,
    signal_correlations,
    token_entropy,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_rollup_margins_are_consistent(spark):
    """Grand total == corpus; each subtotal == sum of its cells; '(all)'
    labels mark exactly the rolled-up positions."""
    docs = spark.read.parquet(DOCS)
    out = rollup_report(docs).collect()
    n = docs.count()
    grand = [r for r in out if r.source == "(all)" and r.lang == "(all)"]
    assert len(grand) == 1 and grand[0].n_rows == n
    # no (all, concrete-lang) rows in a rollup (that's cube territory)
    assert not [r for r in out if r.source == "(all)" and r.lang != "(all)"]
    cells = [r for r in out if r.source != "(all)" and r.lang != "(all)"]
    subs = {r.source: r.n_rows for r in out if r.source != "(all)" and r.lang == "(all)"}
    by_src: dict[str, int] = {}
    for r in cells:
        by_src[r.source] = by_src.get(r.source, 0) + r.n_rows
    assert by_src == subs


def test_pivot_cells_match_groupby(spark):
    docs = spark.read.parquet(DOCS)
    langs = ["de", "en", "es", "fr", "zh"]
    out = {r.source: r for r in pivot_report(docs, values=langs).collect()}
    want = {
        (r.source, r.lang): r.n
        for r in docs.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    for (src, lang), n in want.items():
        assert out[src][f"n_{lang}"] == n
    for src, row in out.items():
        assert row.n_total == sum(row[f"n_{v}"] for v in langs)


def test_decile_populations_balance(spark):
    """(rank-1)·k DIV N buckets differ by at most one row, cover 0..k-1,
    and length ranges descend (bucket 0 = longest docs)."""
    docs = spark.read.parquet(DOCS)
    out = sorted(decile_report(docs).collect(), key=lambda r: r.bucket)
    n = docs.count()
    assert [r.bucket for r in out] == list(range(10))
    assert sum(r.n_rows for r in out) == n
    assert max(r.n_rows for r in out) - min(r.n_rows for r in out) <= 1
    for a, b in zip(out, out[1:]):
        assert a.min_len >= b.max_len  # descending, boundary ties allowed


def test_token_entropy_closed_forms(spark):
    """Uniform k-term distribution → ln k; single repeated term → 0."""
    df = spark.createDataFrame(
        [
            ("u", "a b c d"),
            ("mono", "x x x x"),
        ],
        "source string, text string",
    )
    got = {r.source: r for r in token_entropy(df).collect()}
    assert abs(got["u"].entropy - math.log(4)) < 1e-6
    assert got["u"].n_terms == 4 and got["u"].n_tokens == 4
    assert got["mono"].entropy == 0.0 and got["mono"].n_terms == 1


def test_token_entropy_partitioning_invariant(spark):
    """The round-9 decimal sum makes entropy independent of partition
    count — the oracle-gate float discipline."""
    docs = spark.read.parquet(DOCS)
    a = sorted(tuple(r) for r in token_entropy(docs).collect())
    b = sorted(tuple(r) for r in token_entropy(docs.repartition(13)).collect())
    assert a == b


def test_signal_correlation_closed_forms(spark):
    """Perfect linear relation → 1.0; perfect inverse → −1.0."""
    rows = [("lin", "w " * (i + 1), (i + 1) * 2) for i in range(5)] + [
        ("inv", "w " * (i + 1), 100 - 7 * i) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "source string, text string, n_chars long")
    got = {r.source: r.corr for r in signal_correlations(df).collect()}
    assert got["lin"] == 1.0
    assert got["inv"] == -1.0
