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


def test_ks_drift_closed_form_two_groups(spark):
    """Hand-checked 5-row corpus: both groups of a two-group corpus see
    the same D (KS is symmetric when 'rest' is the other group), max at
    the first length step."""
    from bistro_spark.operators.olap import ks_drift

    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 3)],
        "source string, n_chars long",
    )
    got = {r["source"]: r for r in ks_drift(df).collect()}
    assert got["A"]["ks_stat"] == round(4 / 6, 6)
    assert got["B"]["ks_stat"] == round(4 / 6, 6)
    assert got["A"]["ks_len"] == 1 and got["B"]["ks_len"] == 1
    assert got["A"]["n"] == 3 and got["B"]["n"] == 2


def test_ks_drift_identical_distribution_is_zero(spark):
    from bistro_spark.operators.olap import ks_drift

    rows = [("A", v) for v in (1, 2, 3)] + [("B", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    for r in ks_drift(df).collect():
        assert r["ks_stat"] == 0.0


def test_source_kl_closed_form_and_nonnegative(spark):
    """KL against the corpus mixture, computed by hand with the same
    round-9-then-sum discipline; every group's KL ≥ 0 on real data."""
    from bistro_spark.operators.olap import source_kl

    df = spark.createDataFrame(
        [("A", "a a b"), ("B", "b b")], "source string, text string"
    )
    got = {r["source"]: r for r in source_kl(df).collect()}
    kl_a = (
        round(2 * math.log(2 * 5 / (3 * 2)), 9)
        + round(1 * math.log(1 * 5 / (3 * 3)), 9)
    ) / 3
    kl_b = round(2 * math.log(2 * 5 / (2 * 3)), 9) / 2
    assert got["A"]["kl"] == round(kl_a, 6)
    assert got["B"]["kl"] == round(kl_b, 6)
    assert got["A"]["n_tokens"] == 3 and got["B"]["n_tokens"] == 2

    real = source_kl(spark.read.parquet(DOCS)).collect()
    assert len(real) == 20 and all(r["kl"] >= 0 for r in real)


def test_contingency_report_margins(spark):
    """Observed sums to the margins; expected preserves the row margin;
    contributions are non-negative."""
    from bistro_spark.operators.olap import contingency_report

    rep = contingency_report(spark.read.parquet(DOCS)).collect()
    grand = rep[0]["grand_total"]
    assert sum(r["observed"] for r in rep) == grand
    by_row = {}
    for r in rep:
        by_row.setdefault(r["len_bucket"], []).append(r)
    for rows in by_row.values():
        rt = rows[0]["row_total"]
        assert sum(r["observed"] for r in rows) == rt
    for r in rep:
        # per-cell identity over exact margins (empty cells are not
        # emitted, so row-sums of `expected` need a dense grid — the
        # identity itself is the invariant)
        assert r["expected"] == round(
            r["row_total"] * r["col_total"] / grand, 6
        )
    assert all(r["contrib"] >= 0 for r in rep)


# ------------------------------------------------- cardinality report ----
def test_cardinality_report_exact_known_values(spark):
    from bistro_spark.operators.olap import cardinality_report

    rows = [
        (1, "a", "en", "s1"), (2, "a", "en", "s1"), (3, "b", "de", "s1"),
        (4, "c", "en", "s2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    got = {
        r["source"]: (r["n_rows"], r["n_text"], r["n_lang"], r["dup_ratio"])
        for r in cardinality_report(df).collect()
    }
    assert got == {
        "s1": (3, 2, 2, round(1 - 2 / 3, 6)),
        "s2": (1, 1, 1, 0.0),
    }


def test_cardinality_report_sketch_path_bounds_and_plan(spark):
    """HLL++ path: same schema, distincts within 3*rsd of exact, and the
    plan is a plain two-level partial aggregation (no EXPAND — the
    sketch is mergeable, the shuffle is one narrow row per group)."""
    from bistro_spark.operators.olap import cardinality_report

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    exact = {
        r["source"]: r for r in cardinality_report(docs).collect()
    }
    approx_df = cardinality_report(docs, approx=True, rsd=0.05)
    assert approx_df.columns == list(exact.values())[0].__fields__
    for r in approx_df.collect():
        e = exact[r["source"]]
        assert r["n_rows"] == e["n_rows"]
        for c in ("n_text", "n_lang"):
            assert abs(r[c] - e[c]) <= max(3, 0.15 * e[c]), (r, e)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


# ------------------------------------------------------- zipf_alpha ----
def test_zipf_alpha_hand_computed_and_partition_invariant(spark):
    import math

    from bistro_spark.operators.olap import zipf_alpha

    df = spark.createDataFrame(
        [("g", "a a b"), ("g", "a c")], ["source", "text"]
    )
    # counts: a=3, b=1, c=1 -> n_terms 3, n_tokens 5
    slnx = round(math.log(6.0), 9) + 2 * round(math.log(2.0), 9)
    want = round(1.0 + 3 / slnx, 6)
    for n in (1, 4):
        row = zipf_alpha(df.repartition(n)).collect()[0]
        assert (row["n_terms"], row["n_tokens"]) == (3, 5)
        assert row["alpha"] == want


# ---------------------------------------------------- corpus_health ----
def test_corpus_health_consistent_with_constituents(spark):
    from bistro_spark.operators.olap import (
        cardinality_report,
        corpus_health,
        token_entropy,
        zipf_alpha,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    h = {r["source"]: r for r in corpus_health(docs).collect()}
    card = {
        r["source"]: r
        for r in cardinality_report(
            docs, distinct_cols=("text",)
        ).collect()
    }
    ent = {r["source"]: r for r in token_entropy(docs).collect()}
    alp = {r["source"]: r for r in zipf_alpha(docs).collect()}
    assert set(h) == set(card) == set(ent) == set(alp)
    for g, r in h.items():
        assert r["n_rows"] == card[g]["n_rows"]
        assert r["dup_ratio"] == card[g]["dup_ratio"]
        assert r["entropy"] == ent[g]["entropy"]
        assert r["alpha"] == alp[g]["alpha"]
        assert 0.0 <= r["mean_quality"] <= 3.0


def test_new_report_ops_empty_input_schemas(spark):
    """Empty corpus: every new report op returns an EMPTY frame with
    its documented schema (no div-by-zero, no null explosions)."""
    from bistro_spark.operators.olap import (
        cardinality_report,
        corpus_health,
        token_entropy,
        zipf_alpha,
    )
    from bistro_spark.operators.ranking import rrf_fusion
    from bistro_spark.operators.curation import calibrate_signal

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(0)
    )
    for fn, cols in [
        (cardinality_report, ["source", "n_rows", "n_text", "n_lang",
                              "dup_ratio"]),
        (token_entropy, ["source", "n_terms", "n_tokens", "entropy"]),
        (zipf_alpha, ["source", "n_terms", "n_tokens", "alpha"]),
        (corpus_health, ["source", "n_rows", "n_distinct", "dup_ratio",
                         "n_terms", "n_tokens", "entropy", "alpha",
                         "mean_quality"]),
        (rrf_fusion, ["doc_id", "r_diversity", "r_length", "r_brevity",
                      "rrf_score"]),
        (calibrate_signal, ["doc_id", "source", "v", "pct"]),
    ]:
        out = fn(docs)
        assert out.columns == cols, fn.__name__
        assert out.count() == 0, fn.__name__
