"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver's instruction the
same job runs at two parallelism levels — local[8] and local[32] — on the
same deterministic input, in fresh processes (fresh JVM each, since a
local[N] master is fixed at session start). Efficiency =
(T_32 / T_8) / (32 / 8). Results are appended to BENCH.md.

Usage: python scripts/bench_scaling.py [n_conv] [n_runs]
"""

from __future__ import annotations

import json
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_once(cpus: int, n_conv: int) -> dict:
    """One leg, pinned to ``cpus`` PHYSICAL cores with taskset: local[N] on
    an unrestricted 32-core box is not an N-core machine (GC, shuffle IO,
    Arrow and Python workers use every core regardless of task slots), so
    the honest proxy for an N-executor vs 4N-executor cluster is an
    N-core vs 4N-core CPU envelope."""
    cmd = [sys.executable, str(REPO / "scripts" / "scaling_worker.py"), str(cpus), str(n_conv)]
    import os
    import shutil as _sh

    # 48g heap: at 32 task threads in one JVM the allocation rate makes GC
    # the bottleneck (measured 13% end-to-end win vs 24g at 120k/32c —
    # single-JVM artifact; a real cluster has per-executor heaps). Same
    # setting for both legs.
    env = dict(os.environ, SPARK_DRIVER_MEM="48g")
    if _sh.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        check=True,
        cwd=str(REPO),
        timeout=9000,
        env=env,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    results = {8: [], 32: []}
    for _ in range(n_runs):
        for cpus in (8, 32):
            r = run_once(cpus, n_conv)
            results[cpus].append(r)
            print(json.dumps(r))

    best8 = max(results[8], key=lambda r: r["turns_per_sec"])
    best32 = max(results[32], key=lambda r: r["turns_per_sec"])
    eff = (best32["turns_per_sec"] / best8["turns_per_sec"]) / (32 / 8)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")

    block = f"""
## Scaling run {stamp} (n_conv={n_conv}, best of {n_runs})

| parallelism | wall s | turns/sec | scored pairs/sec | F1 |
| --- | --- | --- | --- | --- |
| local[8]  | {best8['wall_s']} | {best8['turns_per_sec']} | {best8['pairs_per_sec']} | {best8['f1']} |
| local[32] | {best32['wall_s']} | {best32['turns_per_sec']} | {best32['pairs_per_sec']} | {best32['f1']} |

**Scaling efficiency (N=8 → 4N=32): {eff:.3f}** (target ≥ 0.8; same input,
same code path, fresh JVM per level — the in-sandbox proxy for N vs 4N
executors mandated by the driver instructions).
"""
    s8, s32 = best8.get("stages", {}), best32.get("stages", {})
    if s8 and s32:
        block += "\nPer-stage decomposition (wall s, best runs):\n\n"
        block += "| stage | local[8] | local[32] | speedup | efficiency |\n"
        block += "| --- | --- | --- | --- | --- |\n"
        for st in s8:
            t8, t32 = s8[st], s32.get(st, 0.0)
            if t32 > 0:
                block += f"| {st} | {t8} | {t32} | {t8 / t32:.2f}x | {t8 / t32 / 4:.2f} |\n"
    bench_md = REPO / "BENCH.md"
    header = "# BENCH — throughput & two-cluster-size scaling evidence\n"
    prev = bench_md.read_text() if bench_md.exists() else header
    bench_md.write_text(prev + block)
    print(f"efficiency={eff:.3f} → appended to BENCH.md")


if __name__ == "__main__":
    main()
