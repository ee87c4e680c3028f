"""Hardware scaling ceiling probe (no Spark): measures how the sandbox
itself scales CPU-parallel, memory-bandwidth-bound work.

Two probes, each run at 1 / lo / hi worker processes (fork pool, one
independent chunk of work per process — zero coordination):
  * tokenize: the pyarrow RE2 tokenizer over deterministic corpus docs
    (the engine's dominant per-core workload)
  * triad: a STREAM-like numpy a = b + s*c over 64 MB arrays
    (pure memory-bandwidth yardstick)

Reported "efficiency(lo->hi)" = (agg_throughput_hi / agg_throughput_lo)
/ (hi / lo) — the same formula BASELINE.md applies to the Spark build.
If the hardware itself cannot reach 0.8 here, no software on this box
can evidence 0.8 between those core counts; the cluster argument is
per-node memory channels (BASELINE.md §scaling).

Usage: python tools/hw_ceiling.py [lo] [hi]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tokenize_work(chunk: int) -> int:
    import pyarrow as pa

    from data_prepper_spark.corpus import gen_chunk
    from data_prepper_spark.tokenizer import tokenize_flat_arrow

    pdf = gen_chunk(chunk, 100000)
    arr = pa.array(pdf["content"].tolist(), type=pa.string())
    flat, _, _ = tokenize_flat_arrow(arr)
    return len(pdf)


def triad_work(_: int) -> int:
    import numpy as np

    n = 8 << 20  # 64 MB per array
    b = np.random.default_rng(1).random(n)
    c = np.random.default_rng(2).random(n)
    a = np.empty(n)
    for _ in range(40):
        np.multiply(c, 3.0, out=a)
        a += b
    return n


def run(pool_sizes: list[int], work, unit: str) -> dict[int, float]:
    out = {}
    for n in pool_sizes:
        with mp.get_context("fork").Pool(n) as p:
            t0 = time.time()
            res = p.map(work, range(n))
            wall = time.time() - t0
        out[n] = sum(res) / wall
        print(f"  {n:3d} procs: {out[n]:12.0f} {unit}/s aggregate", flush=True)
    return out


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sizes = sorted({1, lo, hi})
    for name, work, unit in (
        ("tokenize(pyarrow RE2)", tokenize_work, "docs"),
        ("triad(numpy a=b+s*c)", triad_work, "elem"),
    ):
        print(f"{name}:", flush=True)
        r = run(sizes, work, unit)
        eff = (r[hi] / r[lo]) / (hi / lo)
        print(f"  efficiency({lo}->{hi}) = {eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
