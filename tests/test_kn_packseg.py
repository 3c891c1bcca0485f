"""Kneser-Ney bigram LM scoring (worked example + proper-distribution
property + SQL twin), CCNet perplexity tertiles, and the trainer-ready
pack_segments layout."""

from __future__ import annotations

import math

import duckdb
import pytest

from bistro_spark.operators.curation import (
    ccnet_buckets,
    ccnet_buckets_sql,
    kneser_ney_logprob,
    kneser_ney_logprob_sql,
    pack_segments,
    pack_segments_sql,
    pack_sequences,
)

D = 0.75


def _texts(n: int) -> list[tuple[int, str, str]]:
    """Deterministic skewed corpus: Zipf-ish word draws, 3 sources."""
    # quadratic residues mod 97 -> 49 distinct words: the bigram graph
    # stays SPARSE (a complete bigram matrix makes interpolated KN
    # collapse to MLE exactly, since n1fw*n1bw/tt = 1)
    words = [f"w{(i * i) % 97}" for i in range(200)]
    rows = []
    for i in range(n):
        ln = 3 + (i * 7) % 20
        toks = [words[(i * 31 + j * j * 17) % 200] for j in range(ln)]
        rows.append((i, " ".join(toks), f"s{i % 3}"))
    return rows


def test_kn_worked_example(spark):
    # corpus: "a b a b" + "b a c"
    # bc: (a,b)=2 (b,a)=2 (a,c)=1; h(a)=3 n1fw(a)=2; h(b)=2 n1fw(b)=1
    # n1bw(a)=1 n1bw(b)=1 n1bw(c)=1; tt=3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in kneser_ney_logprob(df).collect()}
    p_b_a = (max(2 - D, 0) + D * 2 * (1 / 3)) / 3  # 1.75/3
    p_a_b = (max(2 - D, 0) + D * 1 * (1 / 3)) / 2  # 1.5/2
    p_c_a = (max(1 - D, 0) + D * 2 * (1 / 3)) / 3  # 0.75/3
    lp = lambda p: round(math.log(p), 9)  # noqa: E731
    assert got[1]["n_bigrams"] == 3
    assert got[1]["mean_logprob"] == pytest.approx(
        round((2 * lp(p_b_a) + lp(p_a_b)) / 3, 6), abs=1e-6
    )
    assert got[2]["n_bigrams"] == 2
    assert got[2]["mean_logprob"] == pytest.approx(
        round((lp(p_a_b) + lp(p_c_a)) / 2, 6), abs=1e-6
    )


def test_kn_is_a_proper_distribution():
    # driver-side replica of the engine's formula on the worked corpus:
    # for every history, p_KN summed over the FULL vocab (seen + unseen
    # successors) must be exactly 1 — the discount mass is redistributed,
    # not lost.
    bc = {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}
    vocab = {"a", "b", "c"}
    h = {"a": 3, "b": 2}
    n1fw = {"a": 2, "b": 1}
    n1bw = {"a": 1, "b": 1, "c": 1}
    tt = 3
    for w1 in h:
        total = sum(
            (
                max(bc.get((w1, w2), 0) - D, 0.0)
                + D * n1fw[w1] * (n1bw[w2] / tt)
            )
            / h[w1]
            for w2 in vocab
        )
        assert total == pytest.approx(1.0, abs=1e-12)


def test_kn_discount_diverges_from_mle(spark):
    # sanity: KN is NOT the MLE bigram score — a doc repeating one rare
    # bigram scores lower under KN than a doc of well-connected words.
    from bistro_spark.operators.curation import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a c")], "doc_id long, text string"
    )
    kn = {r["doc_id"]: r["mean_logprob"] for r in kneser_ney_logprob(df).collect()}
    mle = {r["doc_id"]: r["mean_logprob"] for r in bigram_logprob(df).collect()}
    assert set(kn) == set(mle)
    # p_MLE(b|a) = 2/3 but p_KN(b|a) = 7/12 — the discount moved mass
    assert all(abs(kn[k] - mle[k]) > 1e-6 for k in kn)


def test_kn_sql_twin(spark):
    rows = _texts(60)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(tuple(r) for r in kneser_ney_logprob(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?,?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(kneser_ney_logprob_sql("docs")).fetchall()
    )
    assert got == want


def test_ccnet_buckets_semantics_and_twin(spark):
    rows = _texts(90)
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = ccnet_buckets(df).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r["bucket"]] += 1
        # NTILE(3): bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        # every head score >= every tail score
        heads = [r["mean_logprob"] for r in rs if r["bucket"] == "head"]
        tails = [r["mean_logprob"] for r in rs if r["bucket"] == "tail"]
        assert min(heads) >= max(tails)
    got = sorted(tuple(r) for r in out)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
    want = sorted(tuple(r) for r in con.execute(ccnet_buckets_sql()).fetchall())
    assert got == want


def test_pack_segments_layout(spark):
    rows = [(i, 1 + (i * 13) % 90) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_words long")
    cap = 100
    segs = pack_segments(df, capacity=cap, n_shards=3).collect()
    packed = pack_sequences(df, capacity=cap, n_shards=3).collect()
    by_pack: dict[tuple, list] = {}
    for r in packed:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    assert len(segs) == len(by_pack)
    for s in segs:
        members = sorted(
            by_pack[(s["shard"], s["pack_id"])], key=lambda r: r["offset"]
        )
        assert s["doc_ids"] == [m["doc_id"] for m in members]
        assert s["offsets"] == [m["offset"] for m in members]
        assert s["seg_lens"] == [m["len"] for m in members]
        assert s["n_segments"] == len(members)
        assert s["fill_tokens"] == sum(m["len"] for m in members)
        # offsets are the running prefix of seg_lens
        run = 0
        for off, ln in zip(s["offsets"], s["seg_lens"]):
            assert off == run
            run += ln
        if s["fill_tokens"] <= cap:
            assert s["pad_tokens"] == cap - s["fill_tokens"]
        else:  # oversize single doc gets its own pack, pad clamped at 0
            assert s["n_segments"] == 1 and s["pad_tokens"] == 0


def test_pack_segments_sql_twin(spark):
    rows = [(i, f"{'x ' * (1 + (i * 13) % 40)}".strip()) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import functions as F

    docs = df.select("doc_id", F.size(F.split("text", " ")).alias("n_words"))
    got = sorted(
        tuple(
            tuple(v) if isinstance(v, list) else v
            for v in r
        )
        for r in pack_segments(docs, capacity=64, n_shards=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", rows)
    want = sorted(
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in con.execute(
            pack_segments_sql("documents", capacity=64, n_shards=3)
        ).fetchall()
    )
    assert got == want
