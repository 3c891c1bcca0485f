"""Product quantization (Jégou et al. 2011, re-expressed Spark-first):
codebook sampling determinism, exact-int encode vs brute numpy (incl.
the argmin tie rule), ADC top-k vs brute reconstruction, the exact-L2
ground truth, SQL twins on a synthetic non-default geometry, and the
recall self-audit's bounds."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
from pyspark.sql import functions as F

from bistro_spark.operators.similarity import (
    l2_topk,
    l2_topk_sql,
    pq_encode,
    pq_sample_codebook,
    pq_topk,
    pq_topk_sql,
)

SCALE = 10**6


def _synth(n: int = 40, dim: int = 8):
    """Deterministic embeddings with exactly-representable floats
    (multiples of 1/8) so integer quantization is tie-free by
    construction."""
    return [
        (
            i,
            [((i * 31 + d * 7) % 13 - 6) / 8.0 for d in range(dim)],
        )
        for i in range(n)
    ]


def _spark_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _iq(vec):
    return np.asarray(
        [int(round(float(np.float32(x)) * SCALE)) for x in vec],
        dtype=np.int64,
    )


def test_pq_codebook_and_encode_brute_parity(spark):
    rows = _synth()
    df = _spark_df(spark, rows)
    cb = pq_sample_codebook(df, n_codes=4, scale=SCALE)
    # codebook = quantized vectors of the 4 smallest md5(id), in order
    order = sorted(
        range(len(rows)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )[:4]
    want_cb = [list(_iq(rows[i][1])) for i in order]
    assert cb == want_cb

    C = np.asarray(cb, dtype=np.int64)
    m, sub = 4, 2
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df, cb, m=m, scale=SCALE).collect()
    }
    for i, vec in rows:
        X = _iq(vec)
        want = []
        for s in range(m):
            d = ((X[s * sub : (s + 1) * sub] - C[:, s * sub : (s + 1) * sub]) ** 2).sum(1)
            want.append(int(d.argmin()))  # ties -> smallest index
        assert got[i] == want


def test_pq_topk_equals_brute_adc(spark):
    rows = _synth()
    df = _spark_df(spark, rows)
    m, sub, n_codes, k = 4, 2, 4, 3
    cb = pq_sample_codebook(df, n_codes=n_codes, scale=SCALE)
    C = np.asarray(cb, dtype=np.int64)
    queries = df.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = [
        tuple(r)
        for r in pq_topk(
            df, queries, k=k, m=m, n_codes=n_codes, scale=SCALE
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    # brute: codes per vec, ADC table per query, rank by (adist, id)
    codes = {}
    for i, vec in rows:
        X = _iq(vec)
        codes[i] = [
            int(
                (
                    (X[s * sub : (s + 1) * sub] - C[:, s * sub : (s + 1) * sub])
                    ** 2
                )
                .sum(1)
                .argmin()
            )
            for s in range(m)
        ]
    want = []
    for qid in (0, 1):
        Q = _iq(rows[qid][1])
        T = [
            ((Q[s * sub : (s + 1) * sub] - C[:, s * sub : (s + 1) * sub]) ** 2).sum(1)
            for s in range(m)
        ]
        scored = sorted(
            (
                int(sum(T[s][codes[i][s]] for s in range(m))),
                i,
            )
            for i, _ in rows
        )
        want += [
            (qid, r + 1, i, ad) for r, (ad, i) in enumerate(scored[:k])
        ]
    assert got == want


def test_l2_topk_exact_brute_parity(spark):
    rows = _synth()
    df = _spark_df(spark, rows)
    queries = df.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = [
        tuple(r)
        for r in l2_topk(df, queries, k=3, scale=SCALE)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = []
    for qid in (0, 1):
        Q = _iq(rows[qid][1])
        scored = sorted(
            (int(((_iq(vec) - Q) ** 2).sum()), i) for i, vec in rows
        )
        want += [(qid, r + 1, i, d) for r, (d, i) in enumerate(scored[:3])]
    assert got == want
    # the exact path finds the query itself at distance 0
    assert got[0][2] == 0 and got[0][3] == 0


def test_pq_sql_twins_nondefault_geometry(spark):
    rows = _synth(n=60, dim=8)
    df = _spark_df(spark, rows)
    queries = df.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    for op_df, sql in [
        (
            l2_topk(df, queries, k=4),
            l2_topk_sql("e", query_pred="vec_id < 2", k=4, dim=8),
        ),
        (
            pq_topk(df, queries, k=4, m=4, n_codes=4),
            pq_topk_sql(
                "e", query_pred="vec_id < 2", k=4, m=4, n_codes=4, dim=8
            ),
        ),
    ]:
        got = sorted(tuple(r) for r in op_df.collect())
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want


def test_pq_recall_bounds(spark):
    import __spark_entry__ as ent

    rows = {
        r["query_id"]: r
        for r in ent.q_pq_recall(spark, "/root/testdata/sf0.001").collect()
    }
    assert sorted(rows) == [0, 1, 2]
    for r in rows.values():
        assert r["n_exact"] == 5
        assert 0 <= r["n_hit"] <= 5
        assert abs(r["recall"] - r["n_hit"] / r["n_exact"]) < 1e-9


def test_contrastive_topk_brute_parity_and_kinds(spark):
    from bistro_spark.operators.similarity import contrastive_topk

    rows = [(i, [((i * 31 + d * 7) % 13 - 6) / 8.0 for d in range(8)], i % 3)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    anchors = df.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    got = sorted(
        tuple(r) for r in contrastive_topk(df, anchors, k=3).collect()
    )
    want = []
    for qid in (0, 1):
        Q = _iq(rows[qid][1])
        ql = rows[qid][2]
        d = [(int(((_iq(v) - Q) ** 2).sum()), i, lb) for i, v, lb in rows]
        neg = sorted((dd, i, lb) for dd, i, lb in d if lb != ql)[:3]
        pos = sorted(
            (dd, i, lb) for dd, i, lb in d if lb == ql and i != qid
        )[:3]
        want += [(qid, "neg", r + 1, i, lb, dd)
                 for r, (dd, i, lb) in enumerate(neg)]
        want += [(qid, "pos", r + 1, i, lb, dd)
                 for r, (dd, i, lb) in enumerate(pos)]
    assert got == sorted(want)
    # the anchor itself never appears as its own positive
    assert all(not (q == v and k == "pos") for q, k, _, v, _, _ in got)


def test_contrastive_topk_sql_twin_and_null_guard(spark):
    import pytest

    from bistro_spark.operators.similarity import (
        contrastive_topk,
        contrastive_topk_sql,
    )

    rows = [(i, [((i * 31 + d * 7) % 13 - 6) / 8.0 for d in range(8)], i % 3)
            for i in range(50)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    anchors = df.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    got = sorted(
        tuple(r) for r in contrastive_topk(df, anchors, k=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            contrastive_topk_sql("e", anchor_pred="vec_id < 2", k=4, dim=8)
        ).fetchall()
    )
    assert got == want
    # NULL labels fail loudly instead of silently vanishing
    bad = spark.createDataFrame(
        [(0, rows[0][1], None)], "vec_id long, embedding array<float>, label int"
    ).union(df)
    with pytest.raises(Exception):
        contrastive_topk(bad, anchors, k=2).collect()


def test_pq_distortion_sweep_brute_and_monotone(spark):
    """Per-m distortion equals the brute per-vector sum of subspace
    minima, and distortion is monotone non-increasing in m (finer
    subspaces can only fit better: the m-way min sum refines the
    m/2-way one)."""
    from bistro_spark.operators.similarity import (
        pq_distortion_sweep,
        pq_sample_codebook,
    )

    rows = _synth(n=40, dim=8)
    df = _spark_df(spark, rows)
    cb = pq_sample_codebook(df, n_codes=4, scale=SCALE)
    C = np.asarray(cb, dtype=np.int64)
    got = {
        r["m"]: r
        for r in pq_distortion_sweep(
            df, m_list=(2, 4), n_codes=4, scale=SCALE
        ).collect()
    }
    for m in (2, 4):
        sub = 8 // m
        per_vec = []
        for _i, vec in rows:
            X = _iq(vec)
            per_vec.append(
                sum(
                    int(
                        (
                            (
                                X[s * sub : (s + 1) * sub]
                                - C[:, s * sub : (s + 1) * sub]
                            )
                            ** 2
                        )
                        .sum(1)
                        .min()
                    )
                    for s in range(m)
                )
            )
        r = got[m]
        assert r["n_vec"] == len(rows)
        assert r["total_distortion"] == sum(per_vec)
        assert r["max_distortion"] == max(per_vec)
        assert abs(r["mean_distortion"] - round(sum(per_vec) / len(rows), 6)) < 1e-9
    assert got[4]["total_distortion"] <= got[2]["total_distortion"]


def test_pq_distortion_sweep_sql_twin(spark):
    from bistro_spark.operators.similarity import (
        pq_distortion_sweep,
        pq_distortion_sweep_sql,
    )

    rows = _synth(n=50, dim=8)
    df = _spark_df(spark, rows)
    got = sorted(
        tuple(r)
        for r in pq_distortion_sweep(df, m_list=(2, 4), n_codes=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            pq_distortion_sweep_sql("e", m_list=(2, 4), n_codes=4, dim=8)
        ).fetchall()
    )
    assert got == want
