"""Streaming Kneser-Ney gate: fixed-model scoring parity with the
hash-checked batch scorer on the training corpus, documented OOV
backoff semantics on held-out text, and the stateless-gate contract on
a real file-source stream."""

from __future__ import annotations

import math
import os

import pytest

from bistro_spark.operators.curation import kneser_ney_logprob
from bistro_spark.streaming.lm import fit_kn_model, kn_score_fixed

DOCS = "/root/testdata/sf0.001/documents.parquet"
D = 0.75


def test_fixed_model_equals_batch_scorer_on_training_corpus(spark):
    """Every training-corpus bigram is seen with a seen history, so the
    fixed-model kernel evaluates the identical expression as the
    DuckDB-hash-checked batch operator — exact equality, not approx."""
    docs = (
        spark.read.parquet(DOCS)
        .select("doc_id", "text")
        .filter("doc_id < 150")
    )
    model = fit_kn_model(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in kn_score_fixed(docs, model).collect()
        if r["n_bigrams"] is not None
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in kneser_ney_logprob(docs).collect()
    }
    assert got == want


def test_oov_backoff_semantics(spark):
    # model corpus: "a b a b" + "b a c"
    # hc: a->3 b->2; n1fw: a->2 b->1; n1bw: a,b,c -> 1 each; tt=3
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a c")], "doc_id long, text string"
    )
    model = fit_kn_model(train)
    held = spark.createDataFrame(
        [(10, "a z"), (11, "z a"), (12, "b c"), (13, "solo"), (14, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in kn_score_fixed(held, model).collect()}
    # seen history, unseen bigram AND unseen w2: half-a-type continuation
    p_az = (0.0 + D * 2 * (0.5 / 3)) / 3
    assert got[10]["mean_logprob"] == pytest.approx(
        round(math.log(p_az), 6), abs=2e-6
    )
    # unseen history: pure continuation-unigram backoff
    assert got[11]["mean_logprob"] == pytest.approx(
        round(math.log(1 / 3), 6), abs=2e-6
    )
    # seen history, unseen bigram, seen w2
    p_bc = (0.0 + D * 1 * (1 / 3)) / 2
    assert got[12]["mean_logprob"] == pytest.approx(
        round(math.log(p_bc), 6), abs=2e-6
    )
    # <2 words: explicit NULL row (streaming sinks must not drop arrivals)
    assert got[13]["n_bigrams"] is None and got[13]["mean_logprob"] is None
    assert got[14]["n_bigrams"] is None
    # all finite: the gate never emits -inf on any input
    for r in got.values():
        if r["mean_logprob"] is not None:
            assert math.isfinite(r["mean_logprob"])


def test_kn_gate_on_real_stream(spark, tmp_path):
    """Stateless-gate contract: a streaming DataFrame accepts the fixed
    KN scorer unchanged; committed rows equal the batch application."""
    docs = (
        spark.read.parquet(DOCS)
        .select("doc_id", "text")
        .filter("doc_id < 300")
    )
    model = fit_kn_model(docs.filter("doc_id < 100"))  # fit on a prefix
    src_dir = str(tmp_path / "src")
    for k in range(3):
        docs.filter(f"doc_id % 3 = {k}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src_dir, f"b{k}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    gated = kn_score_fixed(stream, model)
    assert gated.isStreaming
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    want = sorted(tuple(r) for r in kn_score_fixed(docs, model).collect())
    assert got == want


def test_model_size_guard(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_types"):
        fit_kn_model(docs, max_types=3)


# ------------------------------------------------------ trigram gate ----


def test_kn3_fixed_model_equals_batch_scorer_on_training_corpus(spark):
    from bistro_spark.operators.curation import kneser_ney3_logprob
    from bistro_spark.streaming.lm import fit_kn3_model, kn3_score_fixed

    docs = (
        spark.read.parquet(DOCS)
        .select("doc_id", "text")
        .filter("doc_id < 150")
    )
    model = fit_kn3_model(docs)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["mean_logprob"])
        for r in kn3_score_fixed(docs, model).collect()
        if r["n_trigrams"] is not None
    }
    want = {
        r["doc_id"]: (r["n_trigrams"], r["mean_logprob"])
        for r in kneser_ney3_logprob(docs).collect()
    }
    assert got == want


def test_kn3_oov_backoff_semantics(spark):
    from bistro_spark.streaming.lm import fit_kn3_model, kn3_score_fixed

    # model corpus: "a b c a b c" -> trigram types: (a,b,c)x2? No:
    # triples: (a,b,c),(b,c,a),(c,a,b),(a,b,c) -> tc[(a,b,c)]=2, others 1
    train = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    model = fit_kn3_model(train)
    # m types: (b,c),(c,a),(a,b); mh: b->1 c->1 a->1; bw: c->1 a->1 b->1; tt=3
    held = spark.createDataFrame(
        [
            (10, "a b z"),   # seen history (a,b); unseen w3 z
            (11, "z z a"),   # unseen history AND unseen middle: p_uni(a)
            (12, "z b c"),   # unseen history, seen middle b, seen (b,c)
            (13, "xy"),      # <3 words -> NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in kn3_score_fixed(held, model).collect()
    }
    # doc 10: p_uni(z)=0.5/3; p_bi(z|b)=(0+D*1*(0.5/3))/1; seen hist (a,b):
    # p=(max(0-D,0)+D*1*p_bi)/2
    p_bi_zb = (0.0 + D * 1 * (0.5 / 3)) / 1
    p10 = (0.0 + D * 1 * p_bi_zb) / 2
    assert got[10]["mean_logprob"] == pytest.approx(
        round(math.log(p10), 6), abs=2e-6
    )
    # doc 11: unseen middle z -> p_uni(a) = 1/3
    assert got[11]["mean_logprob"] == pytest.approx(
        round(math.log(1 / 3), 6), abs=2e-6
    )
    # doc 12: unseen history (z,b), seen middle b: p_bi(c|b)
    p12 = (max(1 - D, 0.0) + D * 1 * (1 / 3)) / 1
    assert got[12]["mean_logprob"] == pytest.approx(
        round(math.log(p12), 6), abs=2e-6
    )
    assert got[13]["n_trigrams"] is None
    for r in got.values():
        if r["mean_logprob"] is not None:
            assert math.isfinite(r["mean_logprob"])


def test_kn3_gate_on_real_stream(spark, tmp_path):
    import os

    from bistro_spark.streaming.lm import fit_kn3_model, kn3_score_fixed

    docs = (
        spark.read.parquet(DOCS)
        .select("doc_id", "text")
        .filter("doc_id < 200")
    )
    model = fit_kn3_model(docs.filter("doc_id < 80"))
    src_dir = str(tmp_path / "src3")
    for k in range(2):
        docs.filter(f"doc_id % 2 = {k}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src_dir, f"b{k}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    gated = kn3_score_fixed(stream, model)
    assert gated.isStreaming
    out_dir, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    want = sorted(tuple(r) for r in kn3_score_fixed(docs, model).collect())
    assert got == want


def test_kn3_model_size_guard(spark):
    from bistro_spark.streaming.lm import fit_kn3_model

    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_types"):
        fit_kn3_model(docs, max_types=2)
