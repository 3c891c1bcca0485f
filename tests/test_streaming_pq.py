"""Streaming PQ gate: code parity with the hash-checked batch
pq_encode, passthrough columns, codebook-refit determinism, and the
stateless-gate contract on a real file-source stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bistro_spark.operators.similarity import pq_encode, pq_sample_codebook
from bistro_spark.streaming.pq import pq_gate

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_gate_matches_batch_encode_and_keep(spark):
    emb = spark.read.parquet(EMB)
    cb = pq_sample_codebook(emb, n_codes=16)
    # refit on the same snapshot reproduces the codebook bit-for-bit
    assert cb == pq_sample_codebook(emb, n_codes=16)
    got = {
        r["vec_id"]: (list(r["codes"]), r["label"])
        for r in pq_gate(emb, cb, m=8, keep=["label"]).collect()
    }
    want = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, cb, m=8).collect()
    }
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    assert set(got) == set(want)
    for vid, (codes, label) in got.items():
        assert codes == want[vid]
        assert label == labels[vid]


def test_gate_on_real_stream(spark, tmp_path):
    emb = spark.read.parquet(EMB).filter("vec_id < 200")
    cb = pq_sample_codebook(emb, n_codes=16)
    src = str(tmp_path / "src")
    for k in range(2):
        emb.filter(f"vec_id % 2 = {k}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"b{k}"))
    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<float>, label int"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    gated = pq_gate(stream, cb, m=8)
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
    got = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(emb, cb, m=8).collect()
    )
    assert got == want
