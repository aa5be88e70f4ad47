"""Memory-bus ceiling measurement for the scaling-efficiency analysis.

Question: is the 8->32-core end-to-end efficiency plateau (~0.55-0.65,
BENCH.md scaling conclusions) a property of the PIPELINE, or of the BOX?
A real 4N-executor cluster multiplies memory buses with the cores; one
box does not. This experiment measures exactly the resource that differs:

- ``dram``: each worker streams over its own 256 MiB float64 buffer
  (far beyond L3) with numpy sum — pure DRAM read bandwidth. Aggregate
  GB/s at T threads tells how the shared memory controller scales.
- ``cache``: each worker sums a 192 KiB buffer (L2-resident) — the same
  instruction mix with no DRAM traffic. This is the control: if compute
  scales near 1.0 while DRAM does not, the gap is the bus, not the code.

Workers are separate processes pinned one-per-core (sched_setaffinity),
started on a barrier, timed over a fixed wall window. Efficiency(T1->T2)
= (agg_T2 / agg_T1) / (T2 / T1).

Usage: python scripts/exp_membw.py [seconds_per_leg]
Appends a markdown block to stdout; paste/append into BENCH.md.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

DRAM_BYTES = 256 * 1024 * 1024   # per-worker buffer, >> L3
CACHE_BYTES = 192 * 1024         # per-worker buffer, << L2


def _worker(core: int, nbytes: int, seconds: float, barrier, out):
    os.sched_setaffinity(0, {core})
    arr = np.ones(nbytes // 8, dtype=np.float64)
    float(arr.sum())  # touch every page before the timed window
    barrier.wait()
    t0 = time.perf_counter()
    passes = 0
    sink = 0.0
    while True:
        sink += float(arr.sum())
        passes += 1
        if time.perf_counter() - t0 >= seconds:
            break
    dt = time.perf_counter() - t0
    out.put((passes * nbytes / dt, sink))


def run_leg(n_threads: int, nbytes: int, seconds: float) -> float:
    """Aggregate bytes/s over n_threads one-per-core pinned workers."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_threads)
    out = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(c, nbytes, seconds, barrier, out))
        for c in range(n_threads)
    ]
    for p in procs:
        p.start()
    rates = [out.get()[0] for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    legs = [2, 8, 32]
    print(f"## Memory-bus ceiling measurement ({time.strftime('%Y-%m-%d %H:%M')} UTC,"
          f" scripts/exp_membw.py, {seconds:.0f}s/leg, one pinned process per core)\n")
    print("| threads | DRAM-stream agg GB/s | per-thread | cache-resident agg GB/s | per-thread |")
    print("| --- | --- | --- | --- | --- |")
    dram, cache = {}, {}
    for t in legs:
        dram[t] = run_leg(t, DRAM_BYTES, seconds)
        cache[t] = run_leg(t, CACHE_BYTES, seconds)
        print(
            f"| {t} | {dram[t] / 1e9:.1f} | {dram[t] / t / 1e9:.2f} "
            f"| {cache[t] / 1e9:.1f} | {cache[t] / t / 1e9:.2f} |"
        )
    for a, b in [(2, 8), (8, 32)]:
        ed = (dram[b] / dram[a]) / (b / a)
        ec = (cache[b] / cache[a]) / (b / a)
        print(f"\n{a}->{b} threads: DRAM-bandwidth efficiency **{ed:.3f}**, "
              f"cache-resident (compute) efficiency **{ec:.3f}**")


if __name__ == "__main__":
    main()
