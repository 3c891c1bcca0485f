"""North-rule scaling measurement: the SAME streaming job at local[8] and
local[32] (the sandbox stand-in for N vs 4N executors per driver
instruction), via spark-submit --py-files — reports throughput at both and
the scaling efficiency (requirement ≥ 0.8).

Usage: python tools/bench_scaling.py [n_rows] [n_files]
Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "bistro_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "bistro_spark")):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def make_input(n_rows: int, n_files: int) -> str:
    """Token parquet split into n_files (each file = stream delta)."""
    path = f"/tmp/bistro_scaling_tokens_{n_rows}_{n_files}"
    if os.path.exists(os.path.join(path, "_DONE")):
        return path
    shutil.rmtree(path, ignore_errors=True)
    sys.path.insert(0, REPO)
    from bistro_spark.session import get_spark
    from bistro_spark.sources.tokens import token_table_fast

    spark = get_spark(master="local[32]", app_name="gen_scaling_input")
    spark.sparkContext.setLogLevel("ERROR")
    # one job: n_files part-files in a single write (batch composition is
    # hash-arbitrary but fixed; throughput benching doesn't need scripted
    # batch boundaries — the parity tests do, and script theirs explicitly)
    token_table_fast(spark, n_rows, partitions=n_files).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    open(os.path.join(path, "_DONE"), "w").close()
    return path


def run_once(
    master: str, cores: int, inp: str, zpath: str, files_per_trigger: int = 32
) -> dict:
    work = tempfile.mkdtemp(prefix=f"scaling_{cores}_")
    cmd = [
        "spark-submit",
        "--master", master,
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=8g",
        "--py-files", zpath,
        os.path.join(REPO, "bistro_spark", "jobs", "stream_pipeline.py"),
        "--input", inp,
        "--checkpoint", os.path.join(work, "ck"),
        "--sink", os.path.join(work, "out"),
        "--metrics", os.path.join(work, "metrics.jsonl"),
        "--files-per-trigger", str(files_per_trigger),
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    wall = time.time() - t0
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"no JSON from spark-submit: {proc.stderr[-2000:]}")
    out = json.loads(line[-1])
    out["submit_wall_sec"] = round(wall, 1)
    out["work"] = work
    return out


def main() -> None:
    # Geometry matters: per-batch input parallelism (files-per-trigger)
    # must be ≥ the core count being tested, else cores idle and the
    # measurement reflects trigger overhead, not engine scaling. On a real
    # cluster the Iceberg streaming read plans splits to match executors;
    # files-per-trigger=32 is the local stand-in.
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    fpt = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    zpath = build_zip()
    inp = make_input(n_rows, n_files)

    r8 = run_once("local[8]", 8, inp, zpath, fpt)
    r32 = run_once("local[32]", 32, inp, zpath, fpt)
    eff = (r32["seq_per_sec"] / r8["seq_per_sec"]) / 4
    summary = {
        "n_rows": n_rows,
        "n_files": n_files,
        "local8_seq_per_sec": r8["seq_per_sec"],
        "local32_seq_per_sec": r32["seq_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "requirement": 0.8,
        "pass": eff >= 0.8,
        "local8": r8,
        "local32": r32,
    }
    print(json.dumps(summary, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_last.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
