"""The north-rule streaming job, runnable via spark-submit --py-files:

    spark-submit --master local[32] --py-files dist/bistro_spark.zip \
        bistro_spark/jobs/stream_pipeline.py \
        --input /tmp/tokens_stream --checkpoint /tmp/ck --sink /tmp/out \
        --metrics /tmp/metrics.jsonl

calc → link → windowed accumulate over a file-stream of token parquet
(each file = one ActionAdd delta; the Iceberg streaming read swaps in via
sources/io.py on a real cluster), with watermark, exactly-once idempotent
sink, per-partition lineage stamping, and a metrics listener. Prints ONE
JSON line with sustained throughput (warm-up batch excluded).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir of token parquet files")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--sink", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    ap.add_argument("--watermark", default="30 seconds")
    ap.add_argument("--window", default="60 seconds")
    ap.add_argument(
        "--sketch",
        action="store_true",
        help="also compute the per-row dedup sketch (MinHash over token "
        "shingles) and per-window distinct-content count — the "
        "representative training-data pipeline shape",
    )
    ap.add_argument(
        "--state-store",
        choices=["hdfs", "rocksdb"],
        default="hdfs",
        help="state store provider: 'hdfs' (in-memory map + DFS snapshots, "
        "fine for small window state) or 'rocksdb' (off-heap, spill-free — "
        "the 10^12-scale choice when state outgrows executor heaps)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bistro_stream_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if args.state_store == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    from bistro_spark.pipeline import prepare_facts
    from bistro_spark.sources.tokens import TOKEN_SCHEMA
    from bistro_spark.streaming.metrics import (
        MetricsLogListener,
        observe_counts,
        stamp_lineage,
    )
    from bistro_spark.streaming.sink import IdempotentParquetSink
    from bistro_spark.streaming.windows import tumbling_window_accu

    spark.streams.addListener(MetricsLogListener(args.metrics))
    sink = IdempotentParquetSink(args.sink)

    src = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", args.files_per_trigger)
        .parquet(args.input)
    )
    src = stamp_lineage(src)
    # watermark applied AFTER prepare_facts: the sketch path rebuilds the
    # row through mapInArrow, which would orphan an upstream watermark tag
    prepared = prepare_facts(spark, src, sketch=args.sketch).withWatermark(
        "event_time", args.watermark
    )
    aggs = {
        "n_seq": "count(*)",
        "sum_tok": "sum(n_tok_calc)",
        "sum_weighted": "sum(weighted_tok)",
    }
    if args.sketch:
        # streaming dedup statistics: the fused Arrow sketch stage already
        # computed the k=16 stride-1 MinHash signature and its fold as
        # `fingerprint`; the window adds the distinct-content count (HLL)
        # and a signature witness for parity checks
        aggs["n_distinct"] = "approx_count_distinct(fingerprint)"
        aggs["sig_min"] = "min(tok_sig[0])"
    prepared = observe_counts(prepared, "prepared")
    windowed = tumbling_window_accu(
        prepared, "event_time", args.window, ["src"], aggs
    )

    t0 = time.time()
    q = (
        windowed.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: sink.write(df, bid))
        .option("checkpointLocation", args.checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0

    # sustained throughput from the metrics log, warm-up batch excluded
    import os

    rows, secs, batches = 0, 0.0, 0
    if os.path.exists(args.metrics):
        with open(args.metrics) as f:
            events = [json.loads(line) for line in f]
        progress = [e for e in events if e.get("event") == "progress"]
        # skip the first TWO batches: batch 0 pays query planning + codegen
        # + state-store init, batch 1 still pays JIT compilation of the
        # generated code and Python-worker spin-up (measured: batch 1 runs
        # ~1.5-2x slower than steady state at high core counts)
        for e in progress[2:]:
            rows += e.get("num_input_rows") or 0
            secs += (e.get("duration_ms", {}).get("triggerExecution") or 0) / 1000
            batches += 1

    out = {
        "job": "stream_pipeline",
        "wall_sec": round(wall, 2),
        "batches_measured": batches,
        "rows_measured": rows,
        "seq_per_sec": round(rows / secs) if secs else None,
        "master": spark.sparkContext.master,
    }
    print(json.dumps(out))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
