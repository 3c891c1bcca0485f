"""Measure THIS machine's own thread-scaling ceilings — the context every
scaling-efficiency number in BENCH/ must be read against.

Two probes, both pure Python/numpy (no Spark, no JVM):
  cpu: cache-resident integer busy-loop  -> how compute scales with threads
  mem: streaming numpy passes over 160MB -> how DRAM bandwidth scales

On a single box, N->4N thread scaling is bounded by these (one shared
memory controller, one shared L3, hypervisor neighbors). A real N->4N
*executor* scale-out multiplies memory controllers and caches too, so the
cluster ceiling is the cpu probe, not the mem probe. Each (small, large)
pair is measured interleaved `--repeats` times and the best per level is
used (worst-case runs measure neighbor noise, not the machine).

Usage: python tools/hw_ceiling.py [--repeats 3] [--pairs 4:16,8:32]
Prints one JSON line; bench_scaling's BENCH/BASELINE.md quotes the values.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn_cpu(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _burn_mem(reps: int) -> int:
    import numpy as np

    a = np.arange(20_000_000, dtype=np.int64)  # 160 MB
    s = 0
    for _ in range(reps):
        s += int((a % 50257).sum())
    return s


def _measure(kind: str, workers: int) -> float:
    fn, per = (_burn_cpu, 6_000_000) if kind == "cpu" else (_burn_mem, 3)
    with mp.Pool(workers) as pool:
        t0 = time.time()
        pool.map(fn, [per] * workers * 3)
        dt = time.time() - t0
    return workers * 3 * per / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pairs", default="4:16,8:32")
    args = ap.parse_args()
    pairs = [tuple(map(int, p.split(":"))) for p in args.pairs.split(",")]

    out: dict[str, dict] = {}
    for kind in ("cpu", "mem"):
        for small, large in pairs:
            best_s, best_l = 0.0, 0.0
            for _ in range(args.repeats):
                best_s = max(best_s, _measure(kind, small))
                best_l = max(best_l, _measure(kind, large))
            out[f"{kind}_{small}to{large}"] = {
                "small_rate": round(best_s),
                "large_rate": round(best_l),
                "efficiency": round((best_l / best_s) / (large / small), 3),
            }
    print(json.dumps(out))
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "hw_ceiling.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
