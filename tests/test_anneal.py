"""anneal_schedule / repetition_budget: exact grid parity with a
brute-force integer reference, per-step exact-batch apportionment, ppm
sum invariants, and the repetition worked example."""

from __future__ import annotations

from bistro_spark.operators.curation import anneal_schedule, repetition_budget

T, B = 8, 100


def _corpus(spark):
    # 3 sources with skewed char mass: a=600, b=300, c=100 chars
    rows = []
    rid = 0
    for src, n_docs, chars in (("a", 6, 100), ("b", 3, 100), ("c", 2, 50)):
        for _ in range(n_docs):
            rows.append((rid, src, chars))
            rid += 1
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )


def _trunc_div(a, b):
    """Truncate-toward-zero division — Spark DIV and DuckDB // semantics
    (Python // floors, which differs on the negative anneal deltas)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _brute(weights, t_steps, b_size):
    """Integer reference mirroring the documented algorithm."""
    srcs = sorted(weights)
    last = max(srcs)
    tot = sum(weights.values())
    w1 = {s: (weights[s] * 1_000_000) // tot for s in srcs}
    w1[last] += 1_000_000 - sum(w1.values())
    w0 = {s: 1_000_000 // len(srcs) for s in srcs}
    w0[last] += 1_000_000 - sum(w0.values())
    out = {}
    cum = {s: 0 for s in srcs}
    for t in range(1, t_steps + 1):
        wt = {
            s: w0[s] + _trunc_div((w1[s] - w0[s]) * t, t_steps)
            for s in srcs
        }
        wt[last] += 1_000_000 - sum(wt.values())
        base = {s: (wt[s] * b_size) // 1_000_000 for s in srcs}
        rem = {s: (wt[s] * b_size) % 1_000_000 for s in srcs}
        deficit = b_size - sum(base.values())
        order = sorted(srcs, key=lambda s: (-rem[s], s))
        for s in order[:deficit]:
            base[s] += 1
        for s in srcs:
            cum[s] += base[s]
            out[(t, s)] = (wt[s], base[s], cum[s])
    return out


def test_matches_brute_force_grid(spark):
    got = {
        (r["step"], r["source"]): (
            r["weight_ppm"],
            r["n_seqs"],
            r["cum_seqs"],
        )
        for r in anneal_schedule(
            _corpus(spark), weight_col="n_chars", n_steps=T, batch_size=B
        ).collect()
    }
    want = _brute({"a": 600, "b": 300, "c": 100}, T, B)
    assert got == want


def test_every_step_draws_exactly_batch_size(spark):
    rows = anneal_schedule(
        _corpus(spark), weight_col="n_chars", n_steps=T, batch_size=B
    ).collect()
    by_step: dict = {}
    for r in rows:
        by_step.setdefault(r["step"], [0, 0])
        by_step[r["step"]][0] += r["n_seqs"]
        by_step[r["step"]][1] += r["weight_ppm"]
    assert set(by_step) == set(range(1, T + 1))
    for t, (n, ppm) in by_step.items():
        assert n == B, f"step {t} drew {n}"
        assert ppm == 1_000_000, f"step {t} ppm sum {ppm}"


def test_endpoints_uniform_to_natural(spark):
    rows = anneal_schedule(
        _corpus(spark), weight_col="n_chars", n_steps=T, batch_size=B
    ).collect()
    last_step = {r["source"]: r["weight_ppm"] for r in rows if r["step"] == T}
    # natural char mix: a=600/1000, b=300/1000, c=100/1000
    assert last_step == {"a": 600_000, "b": 300_000, "c": 100_000}


def test_repetition_budget_worked_example(spark):
    got = {
        r["source"]: (
            r["n_available"],
            r["n_drawn"],
            r["epochs"],
            r["first_repeat_step"],
        )
        for r in repetition_budget(
            _corpus(spark), weight_col="n_chars", n_steps=T, batch_size=B
        ).collect()
    }
    want = _brute({"a": 600, "b": 300, "c": 100}, T, B)
    avail = {"a": 6, "b": 3, "c": 2}
    for s, n_av in avail.items():
        drawn = sum(want[(t, s)][1] for t in range(1, T + 1))
        first = min(
            (t for t in range(1, T + 1) if want[(t, s)][2] > n_av),
            default=None,
        )
        assert got[s][0] == n_av and got[s][1] == drawn
        assert got[s][3] == first
        assert abs(got[s][2] - drawn / n_av) < 1e-9
