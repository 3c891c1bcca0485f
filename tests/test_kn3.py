"""Kneser-Ney trigram scoring: worked example, proper-distribution
property over the full vocab (both lower layers redistribute exactly
their discount mass), divergence from the bigram KN, and the SQL twin."""

from __future__ import annotations

import math

import duckdb
import pytest

from bistro_spark.operators.curation import (
    kneser_ney3_logprob,
    kneser_ney3_logprob_sql,
)

D = 0.75


def _model(texts):
    """Driver-side replica of the engine's statistics."""
    tc: dict = {}
    for t in texts:
        w = t.split(" ")
        for i in range(len(w) - 2):
            k = (w[i], w[i + 1], w[i + 2])
            tc[k] = tc.get(k, 0) + 1
    h12: dict = {}
    n1fw12: dict = {}
    m: dict = {}
    for (w1, w2, w3), c in tc.items():
        h12[(w1, w2)] = h12.get((w1, w2), 0) + c
        n1fw12[(w1, w2)] = n1fw12.get((w1, w2), 0) + 1
        m[(w2, w3)] = m.get((w2, w3), 0) + 1
    mh: dict = {}
    n1fw2c: dict = {}
    bw: dict = {}
    for (w2, w3), cnt in m.items():
        mh[w2] = mh.get(w2, 0) + cnt
        n1fw2c[w2] = n1fw2c.get(w2, 0) + 1
        bw[w3] = bw.get(w3, 0) + 1
    tt = len(m)
    return tc, h12, n1fw12, m, mh, n1fw2c, bw, tt


def _p(stats, w1, w2, w3):
    tc, h12, n1fw12, m, mh, n1fw2c, bw, tt = stats
    p_uni = bw.get(w3, 0) / tt
    p_bi = (
        max(m.get((w2, w3), 0) - D, 0.0) + D * n1fw2c[w2] * p_uni
    ) / mh[w2]
    return (
        max(tc.get((w1, w2, w3), 0) - D, 0.0) + D * n1fw12[(w1, w2)] * p_bi
    ) / h12[(w1, w2)]


TEXTS = ["a b a b a", "b a c a b", "c a b"]


def test_kn3_worked_example(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    stats = _model(TEXTS)
    got = {r["doc_id"]: r for r in kneser_ney3_logprob(df).collect()}
    for i, t in enumerate(TEXTS):
        w = t.split(" ")
        tris = [(w[j], w[j + 1], w[j + 2]) for j in range(len(w) - 2)]
        lps = [round(math.log(_p(stats, *k)), 9) for k in tris]
        assert got[i]["n_trigrams"] == len(tris)
        assert got[i]["mean_logprob"] == pytest.approx(
            round(sum(lps) / len(lps), 6), abs=1e-6
        )


def test_kn3_proper_distribution():
    stats = _model(TEXTS)
    tc, h12, n1fw12, m, mh, n1fw2c, bw, tt = stats
    vocab = set(bw)
    for (w1, w2) in h12:
        total = sum(_p(stats, w1, w2, w3) for w3 in vocab)
        assert total == pytest.approx(1.0, abs=1e-12), (w1, w2)


def test_kn3_differs_from_bigram_kn(spark):
    from bistro_spark.operators.curation import kneser_ney_logprob

    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    k3 = {
        r["doc_id"]: r["mean_logprob"]
        for r in kneser_ney3_logprob(df).collect()
    }
    k2 = {
        r["doc_id"]: r["mean_logprob"]
        for r in kneser_ney_logprob(df).collect()
    }
    assert any(abs(k3[k] - k2[k]) > 1e-6 for k in k3)


def test_kn3_sql_twin(spark):
    words = [f"w{(i * i) % 53}" for i in range(150)]
    rows = []
    for i in range(50):
        ln = 4 + (i * 7) % 18
        toks = [words[(i * 29 + j * j * 13) % 150] for j in range(ln)]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in kneser_ney3_logprob(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(kneser_ney3_logprob_sql("docs")).fetchall()
    )
    assert got == want


def test_kn3_short_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, "a b c")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in kneser_ney3_logprob(df).collect()}
    assert ids == {3}
