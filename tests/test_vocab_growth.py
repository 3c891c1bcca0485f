"""vocab_growth: brute-force parity (same md5 checkpoints, same
first-appearance accounting), Heaps-exponent sanity on a growing-vocab
corpus, and curve invariants."""

from __future__ import annotations

import hashlib

from bistro_spark.operators.olap import vocab_growth

NB = 5


def _bucket(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % NB


def _rows(n=120):
    # vocabulary keeps growing: doc i introduces words up to index ~i
    rows = []
    for i in range(n):
        words = [f"w{(i * 3 + j * j) % (10 + i)}" for j in range(12)]
        rows.append((i, " ".join(words)))
    return rows


def test_matches_brute_force(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["checkpoint"]: (
            r["n_tokens"],
            r["new_terms"],
            r["cum_tokens"],
            r["cum_vocab"],
        )
        for r in vocab_growth(df, n_checkpoints=NB).collect()
    }
    tok = {b: 0 for b in range(NB)}
    first: dict = {}
    for i, text in rows:
        b = _bucket(i)
        for w in text.split(" "):
            if w:
                tok[b] += 1
                first[w] = min(first.get(w, NB), b)
    new = {b: sum(1 for v in first.values() if v == b) for b in range(NB)}
    ct = cv = 0
    for b in range(NB):
        ct += tok[b]
        cv += new[b]
        assert got[b] == (tok[b], new[b], ct, cv), f"checkpoint {b}"


def test_heaps_fit_sane_and_constant_across_rows(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    out = vocab_growth(df, n_checkpoints=NB).collect()
    betas = {r["heaps_beta"] for r in out}
    ks = {r["heaps_k"] for r in out}
    assert len(betas) == 1 and len(ks) == 1
    beta = betas.pop()
    # a genuinely growing vocabulary: sublinear but positive exponent
    assert 0.0 < beta < 1.0
    # curve invariants
    cvs = [r["cum_vocab"] for r in sorted(out, key=lambda r: r["checkpoint"])]
    assert cvs == sorted(cvs)
    assert len(out) == NB


def test_vocab_truncation_sweep_brute_force(spark):
    from bistro_spark.operators.ranking import vocab_truncation_sweep

    rows = _rows(60)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts: dict = {}
    for _, text in rows:
        for w in text.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    sizes = (3, 10, 25, 10_000)
    got = {
        r["vocab_size"]: (r["covered_tokens"], r["total_tokens"], r["oov_rate"])
        for r in vocab_truncation_sweep(df, sizes=sizes).collect()
    }
    for k in sizes:
        cov = sum(c for _, c in ranked[:k])
        assert got[k][0] == cov and got[k][1] == total
        assert abs(got[k][2] - (1 - cov / total)) < 1e-8
    # a size >= the whole vocabulary covers everything
    assert got[10_000][2] == 0.0


def test_histogram_quantiles_brute_force(spark):
    from bistro_spark.operators.olap import histogram_quantiles

    vals = [1 + (i * 2654435761) % 37 for i in range(300)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, n_chars long"
    )
    qs = (0.25, 0.5, 0.9, 0.99, 1.0)
    got = {
        r["quantile"]: (r["value"], r["n_le"], r["n_total"])
        for r in histogram_quantiles(df, quantiles=qs).collect()
    }
    import math

    s = sorted(vals)
    for q in qs:
        thr = math.ceil(q * len(vals))
        v = s[thr - 1]  # smallest value whose cumulative count >= thr
        n_le = sum(1 for x in vals if x <= v)
        assert got[q] == (v, n_le, len(vals)), q
    # the 100th percentile is the max
    assert got[1.0][0] == max(vals)
