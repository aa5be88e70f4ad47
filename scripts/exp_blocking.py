"""Blocking-stage shuffle experiments (measure, don't guess).

Times ONLY the blocking join (canonicalize is pre-checkpointed and excluded)
for each optimization variant, in a fresh taskset-pinned process per run —
the same methodology as scripts/bench_scaling.py. Used to pick the posting
-join configuration wired into scaling_worker.py; results recorded in
BENCH.md.

Usage:
  python scripts/exp_blocking.py worker <cpus> <n_conv> <variant>   # one leg
  python scripts/exp_blocking.py [n_conv] [cpus ...]                # sweep
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

VARIANTS = {
    "base": dict(salt=8),
    "hash": dict(salt=8, hash_tokens=True),
    "hot": dict(salt=8, hash_tokens=True, salt_hot_product=65536),
    "skinny": dict(salt=8, hash_tokens=True, salt_hot_product=65536,
                   skinny_postings=True),
    "agg": dict(salt=8, hash_tokens=True, salt_hot_product=65536,
                skinny_postings=True, topk_mode="agg"),
}


def worker(cpus: int, n_conv: int, variant: str) -> None:
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.synth import SynthConfig, generate, to_spark

    spark = get_spark("exp-blocking", cpus=cpus, shuffle_partitions=max(cpus * 2, 64))
    ta, tb, _ = generate(SynthConfig(n_conversations=n_conv, seed=42))
    ra = canonicalize(to_spark(spark, ta)).localCheckpoint()
    rb = canonicalize(to_spark(spark, tb)).localCheckpoint()
    t0 = time.time()
    out = top_k_token_join(ra, rb, k=25, tokens_col="shingle_set", **VARIANTS[variant])
    n = out.count()
    wall = time.time() - t0
    print(json.dumps({"variant": variant, "cpus": cpus, "n_conv": n_conv,
                      "pairs": n, "wall_s": round(wall, 2)}))
    spark.stop()


def sweep(n_conv: int, cpu_list: list[int]) -> None:
    import os
    import shutil

    for variant in VARIANTS:
        for cpus in cpu_list:
            cmd = [sys.executable, str(REPO / "scripts" / "exp_blocking.py"),
                   "worker", str(cpus), str(n_conv), variant]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            env = dict(os.environ, SPARK_DRIVER_MEM="24g")
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True, cwd=str(REPO), timeout=3000, env=env)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
        cpus = [int(x) for x in sys.argv[2:]] or [8, 32]
        sweep(n_conv, cpus)
