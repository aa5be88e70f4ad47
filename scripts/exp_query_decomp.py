"""Per-query wall decomposition at bench scale on the CURRENT box.

Question (r5 final session): with the dense kernel + let-binding landed,
each _scored_pairs consumer still costs 15-25 s at sf0.1. How much of that
is (a) the blocking/scoring join itself, (b) the query-specific downstream
(windows / sweep / iterative rounds), (c) fixed per-query plan+codegen+job
latency? The answer decides whether further kernel work can pay or the
remaining cost is scheduling floor amortized at scale (like er_pipeline's
documented floor, BENCH.md 2026-08-19).

Method: one session, N repetitions each of
  - scored_only: force(_scored_pairs)           -> (a) + floor
  - pairs_count: _scored_pairs.count()          -> row count for context
  - full query: force(q_<name>)                 -> (a) + (b) + floor
Downstream cost ~= full - scored_only (floors cancel to first order).
Repetitions interleaved to spread window noise; report per-rep walls.

Usage: python scripts/exp_query_decomp.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "topk_token_join",
    "topk_union_join",
    "topk_rare_union",
    "reciprocal_top1",
    "threshold_sweep",
    "umc_greedy",
    "connected_components",
    "dedup_shingle_jaccard",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import __spark_entry__ as em
    from ertransfer_spark.session import get_spark

    spark = get_spark("exp_query_decomp", cpus=32, shuffle_partitions=32)
    qs = em.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM/codegen once so rep walls measure steady state
    t0 = time.time()
    force(em._scored_pairs(spark, sf_dir))
    warm = time.time() - t0
    n_pairs = em._scored_pairs(spark, sf_dir).count()
    print(f"# warmup scored_pairs force: {warm:.2f} s; n_pairs={n_pairs}")

    walls: dict[str, list[float]] = {"scored_only": []}
    for name in QUERIES:
        walls[name] = []
    for r in range(reps):
        t0 = time.time()
        force(em._scored_pairs(spark, sf_dir))
        walls["scored_only"].append(time.time() - t0)
        for name in QUERIES:
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            walls[name].append(time.time() - t0)

    so = min(walls["scored_only"])
    print(f"\n| query | walls (s) | best | downstream = best - scored_only |")
    print("| --- | --- | --- | --- |")
    print(f"| scored_only | {['%.2f' % w for w in walls['scored_only']]} | {so:.2f} | — |")
    for name in QUERIES:
        b = min(walls[name])
        print(f"| {name} | {['%.2f' % w for w in walls[name]]} | {b:.2f} | {b - so:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
