"""Unigram-LM tokenizer (operators/unigram.py): Viterbi encode parity
with a brute-force reference, EM training properties (likelihood
monotonicity, cluster-shape determinism, coverage), round-trip
losslessness, the out-of-vocab fallback, and the DuckDB fixed-vocab
oracle twin."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from bistro_spark.operators import unigram as U
from bistro_spark.operators.bpe import word_frequencies

SCORES = dict(U.FIXED_UNIGRAM_VOCAB)
MAXLEN = max(len(p) for p in SCORES)


def brute_force(word: str) -> tuple[list[str], float]:
    """Enumerate every segmentation (with single-char fallback) and pick
    (max score, lexicographically smallest piece list) — the definition
    viterbi_segment must match."""
    best = None

    def rec(pos, acc, sc):
        nonlocal best
        if pos == len(word):
            cand = (-sc, list(acc))
            if best is None or cand < best:
                best = cand
            return
        for ln in range(1, min(MAXLEN, len(word) - pos) + 1):
            p = word[pos : pos + ln]
            s = SCORES.get(p)
            if s is None:
                if ln != 1:
                    continue
                s = U.UNK_SCORE
            acc.append(p)
            rec(pos + ln, acc, sc + s)
            acc.pop()

    rec(0, [], 0)
    return best[1], -best[0]


# ----------------------------------------------------------- pure python --


def test_viterbi_matches_brute_force_fuzz():
    rng = random.Random(41)
    for _ in range(300):
        w = "".join(rng.choice("abcdeloth9$") for _ in range(rng.randint(1, 10)))
        got = U.viterbi_segment(U.BOW + w, SCORES, MAXLEN)
        want = brute_force(U.BOW + w)
        assert got == want, w


def test_viterbi_worked_example():
    # "table" has ▁table in the vocab at -5_450_000; any split costs at
    # least ▁tab(-5.35M)+le(-5.4M) = -10.75M — the whole-word piece wins.
    pieces, score = U.viterbi_segment(U.BOW + "table", SCORES, MAXLEN)
    assert pieces == [U.BOW + "table"]
    assert score == -5_450_000
    # out-of-vocab char falls back at UNK_SCORE, segmentation still total
    pieces, score = U.viterbi_segment(U.BOW + "t9", SCORES, MAXLEN)
    assert "9" in pieces
    assert score <= U.UNK_SCORE


def test_tie_break_prefers_lex_smallest():
    # two single-char paths with identical totals: scores force a tie
    scores = {"▁": -1, "a": -2, "b": -2, "ab": -4, "▁a": -3}
    # "▁ab": ▁+a+b = -5, ▁+ab = -5, ▁a+b = -5 — all tie; lex-min list wins
    pieces, score = U.viterbi_segment("▁ab", scores, 2)
    assert score == -5
    assert pieces == min(
        [["▁", "a", "b"], ["▁", "ab"], ["▁a", "b"]]
    )


def test_decode_inverts_encode_serialization():
    pieces, _ = U.viterbi_segment(U.BOW + "scan", SCORES, MAXLEN)
    joined = " ".join(pieces)
    assert U.unigram_decode_pieces(joined) == "scan"
    assert U.unigram_decode_pieces("") == ""


def test_quantize_scores_round_half_away_from_zero():
    q = dict(U.quantize_scores([("a", -1.0000005), ("b", -2.0)], scale=1_000_000))
    assert q == {"a": -1_000_001, "b": -2_000_000}


# ------------------------------------------------------------- spark side --


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_encode_matches_duckdb_oracle(spark, sf_dir):
    enc = U.unigram_encode(_docs(spark, sf_dir), U.FIXED_UNIGRAM_VOCAB)
    got = sorted(tuple(r) for r in enc.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(con.execute(U.unigram_encode_fixed_sql()).fetchall())
    assert got == want


def test_encode_round_trip_lossless(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in U.unigram_encode(docs, U.FIXED_UNIGRAM_VOCAB).collect():
        assert U.unigram_decode_pieces(r["pieces"]) == " ".join(
            texts[r["doc_id"]].split()
        )


def test_encode_plan_is_map_only(spark, sf_dir):
    enc = U.unigram_encode(_docs(spark, sf_dir), U.FIXED_UNIGRAM_VOCAB)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # vocabulary ships via closure, no shuffle


def test_fertility_matches_duckdb(spark, sf_dir):
    got = sorted(tuple(r) for r in U.unigram_fertility(_docs(spark, sf_dir)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(con.execute(U.unigram_fertility_sql()).fetchall())
    assert got == want


# -------------------------------------------------------------- training --


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    vocab = U.unigram_train(
        docs, vocab_size=60, seed_size=200, max_piece_len=5, n_parts=4
    )
    return docs, vocab


def test_train_reaches_target_and_covers_charset(trained):
    docs, vocab = trained
    assert len(vocab) <= 60
    pieces = {p for p, _ in vocab}
    chars = set()
    for r in docs.select("text").collect():
        for w in r["text"].split():
            chars.update(w)
    assert chars <= pieces  # single-char coverage never pruned
    assert U.BOW in pieces
    # probabilities normalize
    assert math.isclose(sum(math.exp(lp) for _, lp in vocab), 1.0, rel_tol=1e-6)


def test_train_deterministic_across_cluster_shapes(spark, trained):
    docs, vocab = trained
    again = U.unigram_train(
        docs.repartition(3), vocab_size=60, seed_size=200, max_piece_len=5,
        n_parts=2,
    )
    assert vocab == again


def test_em_likelihood_monotone(spark, trained):
    docs, vocab = trained
    wf = word_frequencies(docs)
    probs = {p: math.exp(lp) for p, lp in vocab}
    lls = []
    for _ in range(4):
        counts, ll = U._expected_counts(spark, wf, probs, 5, 4)
        total = sum(counts[p] for p in sorted(counts))
        probs = {p: max(counts.get(p, 0.0), 1e-12) / total for p in probs}
        lls.append(ll)
    assert all(b >= a - abs(a) * 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_expected_counts_consistency(spark, trained):
    """Expected piece counts for one word sum to the expected number of
    pieces, which lies between the Viterbi piece count and the max
    segmentation length — a forward-backward self-check."""
    docs, vocab = trained
    probs = {p: math.exp(lp) for p, lp in vocab}
    exp, z = U._forward_backward(U.BOW + "the", probs, 5)
    assert z > 0
    n_exp = sum(exp.values())
    assert 1.0 <= n_exp <= len(U.BOW + "the")


def test_trained_encode_round_trip(spark, trained):
    docs, vocab = trained
    q = U.quantize_scores(vocab)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    enc = U.unigram_encode(docs, q)
    rows = enc.collect()
    assert all(r["score"] is not None for r in rows)
    for r in rows:
        assert U.unigram_decode_pieces(r["pieces"]) == " ".join(
            texts[r["doc_id"]].split()
        )


def test_trained_encode_compresses(spark, trained):
    """Fertility sanity: a trained vocabulary should beat the
    all-single-char segmentation (pieces < chars+words)."""
    docs, vocab = trained
    from pyspark.sql import functions as F

    q = U.quantize_scores(vocab)
    enc = U.unigram_encode(docs, q)
    stats = enc.agg(F.sum("n_pieces").alias("p")).collect()[0]
    base = docs.select(
        F.sum(
            F.length(F.regexp_replace("text", r"\s+", "")) +
            F.size(F.filter(F.split("text", r"\s+"), lambda w: w != ""))
        ).alias("c")
    ).collect()[0]
    assert stats["p"] < base["c"]
