"""Stateful stream-stream link (streaming/join.py): two file-streams joined
on doc_id with watermark-bounded state; parity vs the batch join under the
same time-range condition (all rows on time ⇒ identical result set)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bistro_spark.sources.tokens import TOKEN_SCHEMA, token_table_fast
from bistro_spark.streaming.join import stream_stream_link

N = 400


@pytest.fixture(scope="module")
def two_streams(spark, tmp_path_factory):
    """Left = token rows; right = a 'metadata' stream for a subset of the
    same doc_ids, shifted a few seconds in event time and split into files
    so matching rows arrive in DIFFERENT micro-batches (forcing the join
    to hold state across batches)."""
    root = str(tmp_path_factory.mktemp("ssjoin"))
    full = token_table_fast(spark, N).cache()
    left_dir, right_dir = os.path.join(root, "l"), os.path.join(root, "r")
    for k, (lo, hi) in enumerate([(0, 150), (150, 300), (300, 400)]):
        full.filter(
            (F.col("batch_ofs") >= lo) & (F.col("batch_ofs") < lo + (hi - lo))
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(left_dir, f"b{k}")
        )
    meta = (
        full.filter("batch_ofs % 2 = 0")
        .select(
            "doc_id",
            (F.col("event_time") + F.expr("INTERVAL 5 seconds")).alias(
                "event_time"
            ),
            (F.col("n_tok") * 10).alias("score"),
        )
    )
    # right batches deliberately misaligned with left's
    for k, (lo, hi) in enumerate([(0, 80), (80, 400)]):
        meta.filter(
            (F.col("score") / 10 >= 0)  # keep plan simple; split by doc_id
        ).filter(
            (F.substring("doc_id", 2, 8).cast("int") >= lo)
            & (F.substring("doc_id", 2, 8).cast("int") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(right_dir, f"b{k}")
        )
    return left_dir, right_dir, meta


def test_stream_stream_link_matches_batch(spark, two_streams, tmp_path):
    left_dir, right_dir, meta = two_streams
    lstream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(left_dir)
    )
    rstream = (
        spark.readStream.schema("doc_id string, event_time timestamp, score int")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(right_dir)
    )
    joined = stream_stream_link(
        lstream, rstream, "meta", on="doc_id", max_delay="10 seconds"
    ).select("doc_id", "n_tok", "meta__score")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssl_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["doc_id"], r["n_tok"], r["meta__score"])
        for r in spark.sql("select * from ssl_out").collect()
    }
    # batch oracle: same equi+time-range join on the full frames
    full = token_table_fast(spark, N)
    exp = {
        (r["doc_id"], r["n_tok"], r["score"])
        for r in full.alias("l")
        .join(
            meta.alias("r"),
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (
                F.col("r.event_time")
                >= F.expr("l.event_time - INTERVAL 10 seconds")
            )
            & (
                F.col("r.event_time")
                <= F.expr("l.event_time + INTERVAL 10 seconds")
            ),
        )
        .select("l.doc_id", "l.n_tok", "r.score")
        .collect()
    }
    assert len(got) == len(exp) and got == exp
    assert len(got) == N // 2  # every even doc matched exactly once


def test_stream_stream_link_checkpoint_resume(spark, two_streams, tmp_path):
    """Kill the stateful join mid-stream, resume from the same checkpoint:
    committed output identical to an uninterrupted run (join state — rows
    buffered waiting for the other side — survives restart)."""
    from bistro_spark.streaming.sink import IdempotentParquetSink

    left_dir, right_dir, meta = two_streams

    def build():
        lstream = (
            spark.readStream.schema(TOKEN_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(left_dir)
        )
        rstream = (
            spark.readStream.schema(
                "doc_id string, event_time timestamp, score int"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(right_dir)
        )
        return stream_stream_link(
            lstream, rstream, "meta", on="doc_id", max_delay="10 seconds"
        ).select("doc_id", "n_tok", "meta__score")

    def run(sink, ck, stop_after):
        seen = {"n": 0}

        def fb(df, bid):
            sink.write(df, bid)
            seen["n"] += 1
            if stop_after is not None and seen["n"] >= stop_after:
                raise RuntimeError("injected crash")

        q = (
            build()
            .writeStream.outputMode("append")
            .foreachBatch(fb)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        except Exception:
            pass

    sink1 = IdempotentParquetSink(str(tmp_path / "o1"))
    ck1 = str(tmp_path / "ck1")
    run(sink1, ck1, stop_after=1)  # crash after the first batch commit
    run(sink1, ck1, stop_after=None)  # resume

    sink2 = IdempotentParquetSink(str(tmp_path / "o2"))
    run(sink2, str(tmp_path / "ck2"), stop_after=None)  # uninterrupted

    a = sorted(
        (r["doc_id"], r["n_tok"], r["meta__score"])
        for r in sink1.read_committed(spark).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_tok"], r["meta__score"])
        for r in sink2.read_committed(spark).collect()
    )
    assert a and a == b


def test_stream_stream_link_left_outer(spark, two_streams, tmp_path):
    """Outer stream-stream link: unmatched left rows emit with a NULL
    prefixed key (meta__doc_id) once the watermark closes their window —
    and no duplicate unqualified column names appear in the output."""
    left_dir, right_dir, meta = two_streams
    lstream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(left_dir)
    )
    rstream = (
        spark.readStream.schema("doc_id string, event_time timestamp, score int")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(right_dir)
    )
    joined = stream_stream_link(
        lstream, rstream, "meta", on="doc_id", max_delay="10 seconds",
        how="left_outer",
    )
    assert len(joined.columns) == len(set(joined.columns))
    assert "meta__doc_id" in joined.columns
    out = joined.select("doc_id", "meta__doc_id", "meta__score")
    q = (
        out.writeStream.format("memory")
        .queryName("ssl_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from ssl_outer").collect()
    matched = {r["doc_id"] for r in rows if r["meta__doc_id"] is not None}
    unmatched = {r["doc_id"] for r in rows if r["meta__doc_id"] is None}
    # even docs matched (scores joined), odd docs may surface as unmatched
    # only after the global watermark passes their window — the availableNow
    # run ends at the final watermark, so late-emission count is a subset
    assert all(int(d[1:]) % 2 == 0 for d in matched)
    assert matched and all(int(d[1:]) % 2 == 1 for d in unmatched)
