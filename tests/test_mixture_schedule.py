"""mixture_schedule: telescoping-floor exactness, per-step deviation
bound, the overflow-safe q/r factorization, and the SQL twin."""

from __future__ import annotations

import duckdb

from bistro_spark.operators.curation import (
    mixture_schedule,
    mixture_schedule_sql,
)

B, T = 64, 37


def _docs(spark):
    rows = [(i, f"s{i % 7}") for i in range(331)]  # uneven 7-source mix
    return spark.createDataFrame(rows, "doc_id long, source string"), rows


def test_schedule_exactness(spark):
    df, rows = _docs(spark)
    out = mixture_schedule(df, n_steps=T, batch_size=B).collect()
    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    n_total = len(rows)
    assert len(out) == 7 * T  # full grid
    by_src: dict[str, list] = {}
    for r in out:
        assert r["n_seqs"] >= 0
        by_src.setdefault(r["source"], []).append(r)
    for s, rs in by_src.items():
        rs.sort(key=lambda r: r["step"])
        run = 0
        for r in rs:
            run += r["n_seqs"]
            # telescoping: cumulative allocation IS the floor target
            assert run == r["cum_seqs"] == counts[s] * B * r["step"] // n_total
    # per-step total deviates from B by < #sources, never accumulating
    per_step: dict[int, int] = {}
    for r in out:
        per_step[r["step"]] = per_step.get(r["step"], 0) + r["n_seqs"]
    for t, tot in per_step.items():
        assert abs(tot - B) < 7
    assert sum(per_step.values()) == sum(
        counts[s] * B * T // n_total for s in counts
    )


def test_overflow_safe_factorization():
    # the kernel's q/r split equals the naive bigint floor at scales
    # where n*B*t would overflow int64
    n, n_total, b = 10**12, 3 * 10**12, 1024
    q, r = (n * b) // n_total, (n * b) % n_total
    for t in (1, 999, 10**6, 9 * 10**6):
        assert q * t + (r * t) // n_total == (n * b * t) // n_total
        assert r * t < 2**63 and q * t < 2**63


def test_schedule_sql_twin(spark):
    df, rows = _docs(spark)
    got = sorted(
        tuple(r) for r in mixture_schedule(df, n_steps=T, batch_size=B).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            mixture_schedule_sql("documents", n_steps=T, batch_size=B)
        ).fetchall()
    )
    assert got == want
