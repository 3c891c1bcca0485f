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


# ------------------------------------------------ repetition signals ----


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"),        # bigrams: ab,ba,ab,ba -> top 2/4
         (2, "x y z"),            # all distinct words, top bigram 1/2
         (3, "solo")],            # 1 word: no bigram
        ["doc_id", "text"],
    )
    from bistro_spark.operators.text import repetition_signals

    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[1].n_words == 5 and out[1].n_distinct_words == 2
    assert out[1].dup_word_fraction == 0.6
    assert out[1].top_bigram_count == 2
    assert out[1].top_bigram_fraction == 0.5
    assert out[2].dup_word_fraction == 0.0
    assert out[2].top_bigram_count == 1
    assert out[3].top_bigram_count == 0
    assert out[3].top_bigram_fraction == 0.0


def test_repetition_signals_hof_explode_parity(docs):
    from bistro_spark.operators.text import repetition_signals

    cols = ["doc_id", "n_words", "n_distinct_words", "dup_word_fraction",
            "top_bigram_count", "top_bigram_fraction"]
    hof = sorted(
        tuple(r) for r in repetition_signals(docs, via="hof")
        .select(*cols).collect()
    )
    exp = sorted(
        tuple(r) for r in repetition_signals(docs, via="explode")
        .select(*cols).collect()
    )
    assert hof == exp


# ------------------------------------------------------ PII redaction ----


def test_redact_pii_counts_and_scrubs(spark):
    from bistro_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail bob@example.com and alice@test.org ok"),
         (2, "call +1-555-123-4567 or 555 987 6543 now"),
         (3, "host 192.168.0.1 clean text")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_redact_email == 2
    assert "[EMAIL]" in out[1].text and "@" not in out[1].text
    assert out[2].n_redact_phone == 2
    assert "[PHONE]" in out[2].text
    assert out[3].n_redact_ipv4 == 1
    assert "[IPV4]" in out[3].text and "192.168" not in out[3].text
    # clean text untouched
    assert out[3].text.endswith("clean text")


def test_redact_pii_java_re2_portability(spark):
    """The PII regex subset must mean the same thing to DuckDB's RE2 —
    same match count on the same rows."""
    rows = [
        "mail bob@example.com and alice@test.org ok",
        "call +1-555-123-4567 now",
        "host 192.168.0.1 here",
        "no pii at all",
    ]
    from bistro_spark.operators.text import PII_PATTERNS, redact_pii

    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               ["doc_id", "text"])
    spark_counts = {
        r.doc_id: (r.n_redact_email, r.n_redact_phone, r.n_redact_ipv4)
        for r in redact_pii(df).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(rows):
        duck = tuple(
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))",
                [t, PII_PATTERNS[k]],
            ).fetchone()[0]
            for k in ("email", "phone", "ipv4")
        )
        assert spark_counts[i] == duck, (i, t, spark_counts[i], duck)


# ------------------------------------------------------------- JSONL ----


def test_jsonl_roundtrip_and_corrupt_record(spark, tmp_path, docs):
    from bistro_spark.sources.io import read_jsonl, write_jsonl

    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.select("doc_id", "text", "lang"), p)
    back = read_jsonl(spark, p,
                      schema="doc_id bigint, text string, lang string")
    a = sorted(tuple(r) for r in
               docs.select("doc_id", "text", "lang").collect())
    b = sorted(tuple(r) for r in
               back.select("doc_id", "text", "lang").collect())
    assert a == b
    # corrupt line lands in _corrupt_record, not a job failure
    bad = str(tmp_path / "bad.jsonl")
    with open(bad, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en"}\n')
        f.write("{this is not json\n")
    rows = read_jsonl(spark, bad,
                      schema="doc_id bigint, text string, lang string")
    # Spark disallows a query whose only referenced column is the internal
    # corrupt-record column — project a data column alongside it
    got = rows.select("doc_id", "_corrupt_record").collect()
    good = sum(1 for r in got if r._corrupt_record is None)
    corrupt = sum(1 for r in got if r._corrupt_record is not None)
    assert (good, corrupt) == (1, 1)
