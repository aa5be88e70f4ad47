#!/usr/bin/env python
"""Does whole-stage-codegen subexpression elimination dedupe the 5
array_intersect evaluations inside features_native's projection? A/B:
current form vs explicit let-bound overlap column, on a realistic pair
table; also isolate the jaro_winkler pandas-UDF share of the stage.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ertransfer_spark.session import get_spark  # noqa: E402


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.time(); fn(); ts.append(time.time() - t0)
    print(f"{name}: best {min(ts):.2f}s runs={['%.2f' % t for t in ts]}", flush=True)


def main():
    spark = get_spark("exp_feat", cpus=32, shuffle_partitions=32)
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize
    from ertransfer_spark.operators.matcher import attach_pair_text
    from ertransfer_spark.synth import SynthConfig, generate_spark

    sa, sb, _ = generate_spark(spark, SynthConfig(n_conversations=6000, seed=7))
    ra, rb = canonicalize(sa), canonicalize(sb)
    pairs = top_k_token_join(ra, rb, k=5)
    pt = attach_pair_text(pairs, ra, rb).localCheckpoint()
    n = pt.count()
    print(f"pairs={n}", flush=True)

    from ertransfer_spark.functions.similarity import (
        cosine_sets,
        dice,
        features_native,
        jaccard,
        jaro_winkler_udf,
        levenshtein_sim,
        overlap_coefficient,
    )

    a_t, b_t = F.col("a_tokens"), F.col("b_tokens")

    # current full features
    timed("features_native_full", lambda: force(pt.select("a_id", "b_id", *features_native(
        F.col("a_norm"), F.col("b_norm"), a_t, b_t))))

    # set metrics only, current form (5 intersects textually)
    timed("set_metrics_current", lambda: force(pt.select(
        "a_id", "b_id",
        jaccard(a_t, b_t).alias("j"),
        dice(a_t, b_t).alias("d"),
        cosine_sets(a_t, b_t).alias("c"),
        overlap_coefficient(a_t, b_t).alias("o"),
    )))

    # set metrics with explicit let-bound overlap
    def bound():
        o = F.col("_inter")
        sa_, sb_ = F.size(a_t), F.size(b_t)
        jd = (sa_ + sb_).cast("double") - o
        return force(
            pt.withColumn("_inter", F.size(F.array_intersect(a_t, b_t)).cast("double"))
            .select(
                "a_id", "b_id",
                F.when(jd > 0, o / jd).otherwise(F.lit(0.0)).alias("j"),
                F.when((sa_ + sb_) > 0, F.lit(2.0) * o / (sa_ + sb_).cast("double")).otherwise(F.lit(0.0)).alias("d"),
                F.when(F.sqrt(sa_.cast("double") * sb_.cast("double")) > 0,
                       o / F.sqrt(sa_.cast("double") * sb_.cast("double"))).otherwise(F.lit(0.0)).alias("c"),
                F.when(F.least(sa_, sb_) > 0, o / F.least(sa_, sb_).cast("double")).otherwise(F.lit(0.0)).alias("o"),
            )
        )
    timed("set_metrics_bound", bound)

    # jw UDF alone / lev alone
    timed("jw_udf_only", lambda: force(pt.select(
        "a_id", "b_id",
        jaro_winkler_udf(F.substring("a_norm", 1, 64), F.substring("b_norm", 1, 64)).alias("jw"))))
    timed("lev_only", lambda: force(pt.select(
        "a_id", "b_id",
        levenshtein_sim(F.substring("a_norm", 1, 256), F.substring("b_norm", 1, 256)).alias("l"))))

    spark.stop()


if __name__ == "__main__":
    main()
