"""Streaming decontamination gate: collision-count parity with the
hash-checked batch contamination scan (same gram definition, same
hashing), the <n-words empty contract, and the stateless-gate contract
on a real file-source stream."""

from __future__ import annotations

import os

from bistro_spark.operators.curation import contamination
from bistro_spark.streaming.decontam import decontam_gate, fit_eval_grams

DOCS = "/root/testdata/sf0.001/documents.parquet"
N = 5


def test_gate_matches_batch_contamination(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    train = docs.filter("doc_id % 4 != 0")
    eval_df = docs.filter("doc_id % 4 = 0")
    grams = fit_eval_grams(eval_df, n=N)
    assert grams  # the fixture actually produces eval grams
    gate = {
        r["doc_id"]: r["n_collisions"]
        for r in decontam_gate(train, grams, n=N).collect()
    }
    batch = {
        r["doc_id"]: r["n_collisions"]
        for r in contamination(train, eval_df, n=N).collect()
    }
    # batch returns contaminated docs only; the gate scores every row
    assert set(batch) <= set(gate)
    for k, v in gate.items():
        assert batch.get(k, 0) == v, k
    assert any(v > 0 for v in gate.values())
    assert any(v == 0 for v in gate.values())


def test_short_docs_have_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    grams = fit_eval_grams(
        spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string"),
        n=N,
    )
    got = {r["doc_id"]: r["n_collisions"] for r in
           decontam_gate(df, grams, n=N).collect()}
    assert got == {1: 0, 2: 0}


def test_gate_on_real_stream(spark, tmp_path):
    docs = (
        spark.read.parquet(DOCS)
        .select("doc_id", "text")
        .filter("doc_id < 200")
    )
    grams = fit_eval_grams(docs.filter("doc_id < 40"), n=N)
    src = str(tmp_path / "src")
    for k in range(2):
        docs.filter(f"doc_id % 2 = {k}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"b{k}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    gated = decontam_gate(stream, grams, n=N)
    assert gated.isStreaming
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in decontam_gate(docs, grams, n=N).collect())
    assert got == want
