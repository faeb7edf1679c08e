"""Aggregate memory-bandwidth microbenchmark.

Purpose: turn the single-box scaling analysis in BENCH/BASELINE.md from
an assertion into a measurement. Each worker process streams a
cache-defeating float64 array (numpy sum = pure sequential reads); the
aggregate GB/s at K workers shows where the box's memory controller
saturates. If aggregate bandwidth stops growing past K~8 while the
engine's 8->32 superstep speedup is ~1.9x, the sub-linear pair is a
hardware ceiling (one shared memory controller), not an engine
bottleneck — a real 4x-node cluster multiplies bandwidth instead of
sharing it.

Usage: python tools/bench_membw.py  -> one JSON line + markdown table.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

ARR_BYTES = 512 * 1024 * 1024  # 512 MiB per worker: far beyond any LLC
ITERS = 4


def _stream(q: mp.Queue) -> None:
    import numpy as np

    a = np.ones(ARR_BYTES // 8, dtype=np.float64)
    # warm-up touch (faulting pages in) excluded from timing
    float(a.sum())
    t0 = time.time()
    acc = 0.0
    for _ in range(ITERS):
        acc += float(a.sum())
    dt = time.time() - t0
    q.put((ARR_BYTES * ITERS / dt / 1e9, acc))


def measure(k: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_stream, args=(q,)) for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get()[0] for _ in procs]
    for p in procs:
        p.join()
    return round(sum(rates), 1)


def main() -> None:
    out = {}
    for k in (1, 2, 4, 8, 16, 32):
        out[str(k)] = measure(k)
    print(json.dumps({"aggregate_read_gbps_by_workers": out}))
    print("| workers | aggregate read GB/s | scaling vs 1 |")
    print("|---|---|---|")
    base = out["1"]
    for k, v in out.items():
        print(f"| {k} | {v} | {round(v / base, 2)}x |")


if __name__ == "__main__":
    main()
