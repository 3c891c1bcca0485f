"""heldout_perplexity: split determinism, Laplace math on a worked
example, OOV accounting, and the SQL twin."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from bistro_spark.operators.curation import (
    heldout_perplexity,
    heldout_perplexity_sql,
)


def _is_valid(doc_id: int, holdout: float = 0.1) -> bool:
    thr = format(int(round(holdout * 65536)), "04x")
    return hashlib.md5(str(doc_id).encode()).hexdigest()[:4] < thr


def _texts(n: int) -> list[tuple[int, str, str]]:
    words = [f"w{(i * i) % 97}" for i in range(200)]
    rows = []
    for i in range(n):
        ln = 3 + (i * 7) % 20
        toks = [words[(i * 31 + j * j * 17) % 200] for j in range(ln)]
        rows.append((i, " ".join(toks), f"s{i % 3}"))
    return rows


def test_worked_example(spark):
    # pick ids so the holdout slice is known up-front
    valid_ids = [i for i in range(2000) if _is_valid(i)][:2]
    train_ids = [i for i in range(2000) if not _is_valid(i)][:2]
    rows = [
        (train_ids[0], "a b a", "s"),
        (train_ids[1], "b c", "s"),
        (valid_ids[0], "a z", "s"),  # z is OOV
        (valid_ids[1], "c c", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = heldout_perplexity(df).collect()
    assert len(out) == 1
    r = out[0]
    # train: a=2 b=2 c=1 -> N=5, V=3; p(w) = (c+1)/8
    lp = lambda c: round(math.log((c + 1) / 8), 9)  # noqa: E731
    toks = [lp(2), lp(0), lp(1), lp(1)]  # a, z, c, c
    assert r["n_valid_docs"] == 2 and r["n_tokens"] == 4
    assert r["mean_nll"] == pytest.approx(round(-sum(toks) / 4, 6), abs=2e-6)
    assert r["oov_rate"] == pytest.approx(0.25, abs=1e-9)


def test_split_is_deterministic_and_disjoint(spark):
    rows = _texts(400)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # the SAME doc is held out on every run: two invocations agree exactly
    a = sorted(tuple(r) for r in heldout_perplexity(df).collect())
    b = sorted(tuple(r) for r in heldout_perplexity(df).collect())
    assert a == b
    # holdout fraction lands near 10%
    n_valid = sum(1 for i, _, _ in rows if _is_valid(i))
    assert 0.03 < n_valid / len(rows) < 0.25


def test_sql_twin(spark):
    rows = _texts(300)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(tuple(r) for r in heldout_perplexity(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(heldout_perplexity_sql()).fetchall()
    )
    assert got == want
