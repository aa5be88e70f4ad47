"""er_pipeline fixed-latency decomposition at bench scale (r5, VERDICT #5).

Runs bench.py's run_er_pipeline shape (2000 convs @ sf0.1 equivalent) on
local[32] and prints the per-stage wall_ms from the pipeline's own lineage
table plus total wall — identifies which of the ~29 s is stage scheduling,
fit, or real work. Run ALONE on an idle box.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    from pyspark.sql import functions as F

    from ertransfer_spark.plans.pipeline import ERPipeline, PipelineConfig
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.synth import SynthConfig, generate, to_spark

    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_conv = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark("er-floor", cpus=cpus, shuffle_partitions=max(cpus, 16))
    ta, tb, matches = generate(SynthConfig(n_conversations=n_conv, seed=42))
    sa, sb = to_spark(spark, ta), to_spark(spark, tb)
    m = spark.createDataFrame(matches)
    # warm the JVM/session on a copy first so the measured run isn't
    # paying one-time codegen/classloading (bench pays it once per
    # process too, but the decomposition should show steady state)
    for tag in ("warm", "measured"):
        workdir = tempfile.mkdtemp(prefix=f"er_floor_{tag}_")
        try:
            t0 = time.time()
            pipe = ERPipeline(spark, workdir, PipelineConfig(k=5))
            out = pipe.run(sa, sb, m, resume=False)
            out["clusters"].write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            lin = (
                pipe.catalog.lineage()
                .groupBy("stage").agg(F.max("wall_ms").alias("wall_ms"))
                .collect()
            )
            stages = {r["stage"]: r["wall_ms"] / 1000.0 for r in lin}
            print(json.dumps({"tag": tag, "cpus": cpus, "n_conv": n_conv,
                              "total_sec": round(wall, 2),
                              "stages": {k: round(v, 2) for k, v in
                                         sorted(stages.items(), key=lambda kv: -kv[1])}}),
                  flush=True)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
