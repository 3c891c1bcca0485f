"""Curation operators: deterministic hash sampling, decontamination,
TF-IDF vocabulary, length stats — plus their DuckDB-twin parity and the
short-document n-gram guard."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bistro_spark.operators.curation import (
    contamination,
    contamination_sql,
    hash_sample,
    hash_sample_sql,
    length_stats,
    top_terms,
)
from bistro_spark.operators.dedup import ngram_set

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def _duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con


# ---------------------------------------------------------- hash_sample ----


def test_hash_sample_deterministic_and_stratified(docs):
    a = hash_sample(docs, "doc_id", {"en": 0.25}, "lang", 0.75)
    b = hash_sample(docs, "doc_id", {"en": 0.25}, "lang", 0.75)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0
    # sample of a sample at the same rate is the same sample (prefix filter
    # is idempotent) — the property that makes resumed jobs consistent
    c = hash_sample(a, "doc_id", {"en": 0.25}, "lang", 0.75)
    assert sorted(r.doc_id for r in c.select("doc_id").collect()) == ids_a
    # rates land near their targets per stratum
    tot = {r.lang: r.n for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in
            a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept.get("en", 0) / tot["en"] < 0.5
    non_en_tot = sum(v for k, v in tot.items() if k != "en")
    non_en_kept = sum(v for k, v in kept.items() if k != "en")
    assert 0.5 < non_en_kept / non_en_tot <= 1.0


def test_hash_sample_matches_duckdb(docs):
    spark_ids = sorted(
        r.doc_id
        for r in hash_sample(docs, "doc_id", {"en": 0.25}, "lang", 0.75)
        .select("doc_id").collect()
    )
    pred = hash_sample_sql("doc_id", {"en": 0.25}, "lang", 0.75)
    con = _duck()
    duck_ids = sorted(
        r[0] for r in
        con.sql(f"SELECT doc_id FROM documents WHERE {pred}").fetchall()
    )
    assert spark_ids == duck_ids


def test_hash_sample_rate_edges(docs):
    n = docs.count()
    assert hash_sample(docs, "doc_id", {}, "lang", 1.0).count() == n
    assert hash_sample(docs, "doc_id", {}, "lang", 0.0).count() == 0


# ------------------------------------------------------------ ngram guard ----


def test_ngram_set_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [("a b c",), ("one two three four five six seven eight",)],
        ["text"],
    )
    rows = df.select(ngram_set(F.col("text"), n=5).alias("ng")).collect()
    assert rows[0].ng == []          # 3 words < n=5: no gram, no error
    assert len(rows[1].ng) == 4      # 8 words -> 4 distinct 5-grams


# -------------------------------------------------------- contamination ----


def test_contamination_detects_verbatim_span(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "totally different words here entirely now")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon suffix")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_collisions
           for r in contamination(train, ev, n=4).collect()}
    # doc 1 shares 4-grams "alpha beta gamma delta"+"beta gamma delta
    # epsilon" with the eval doc; doc 2 shares none
    assert out == {1: 2}


def test_contamination_matches_duckdb(spark, docs):
    spark_rows = sorted(
        (r.doc_id, r.n_collisions)
        for r in contamination(
            docs.filter("doc_id % 7 != 0"), docs.filter("doc_id % 7 = 0"),
            n=4,
        ).collect()
    )
    sql = contamination_sql("doc_id % 7 != 0", "doc_id % 7 = 0", n=4)
    con = _duck()
    duck_rows = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0  # premise: the split actually collides


# ------------------------------------------------------------- top_terms ----


def test_top_terms_rank_deterministic_and_bounded(docs):
    out = top_terms(docs, "lang", k=5).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        # ordering is (tf desc, term asc) exactly
        key = [(-r.tf, r.term) for r in rows]
        assert key == sorted(key)
        for r in rows:
            # df is corpus-wide docs containing the term; tf is this
            # group's occurrence count — both at least 1 for a ranked term
            assert r.df >= 1 and r.tf >= 1


# ---------------------------------------------------------- length_stats ----


def test_length_stats_exact_vs_known(spark):
    df = spark.createDataFrame(
        [("x", "a b"), ("x", "a b c d"), ("x", "a b c d e f")],
        ["g", "text"],
    )
    row = length_stats(df, "g", exact=True).collect()[0]
    assert row.n_docs == 3 and row.total_words == 12
    assert row.p50_words == 4.0          # middle of [2, 4, 6]
    assert row.p90_words == pytest.approx(5.6)   # 4 + 0.8*(6-4)


def test_length_stats_approx_close_to_exact(docs):
    exact = {r.lang: r for r in length_stats(docs, "lang",
                                             exact=True).collect()}
    approx = {r.lang: r for r in length_stats(docs, "lang",
                                              exact=False).collect()}
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs and a.total_words == e.total_words
        # words-per-doc spans ~10-100; sketch should land within 20%
        for c in ("p50_words", "p90_words", "p99_words"):
            assert abs(getattr(a, c) - getattr(e, c)) <= 0.2 * getattr(e, c)
