"""Score-stage decomposition: where do the seconds go when featurizing +
scoring candidate pairs?

The round-2 scaling decomposition (BENCH.md) leaves scoring as the
largest stage (≈50% of wall at 8 cores). This experiment isolates its
components on the scaling corpus: the pair-text attach joins, each
native feature expression, the Jaro-Winkler pandas UDF, and the sigmoid
scoring itself. Variants are cumulative-independent (each toggles ONE
component off against the full stack) and every run is a fresh count()
over the same localCheckpointed blocking output, so join/shuffle costs
are included.

Usage: taskset -c 0-7 python scripts/exp_score.py [n_conv=60000] [cpus=8]
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from ertransfer_spark.functions import similarity as S
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize
    from ertransfer_spark.operators.labeling import attach_labels, referential_filter, stratified_split
    from ertransfer_spark.operators.matcher import (
        FEATURES,
        attach_pair_text,
        featurize,
        score,
        train_matcher_local,
    )
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.synth import SynthConfig, generate_spark

    spark = get_spark("exp-score", cpus=cpus, shuffle_partitions=max(cpus * 2, 64))
    sa, sb, matches = generate_spark(spark, SynthConfig(n_conversations=n_conv, seed=42))
    ra = canonicalize(sa).localCheckpoint()
    rb = canonicalize(sb).localCheckpoint()
    golden = referential_filter(matches, ra, rb)
    labeled = attach_labels(
        top_k_token_join(
            ra, rb, k=25, tokens_col="shingle_set", salt=8, hash_tokens=True,
            salt_hot_product=65536, skinny_postings=True, topk_mode="agg",
            max_token_df=500,
        ),
        golden,
    ).localCheckpoint()
    n_pairs = labeled.count()

    train_pairs = stratified_split(labeled)["train"]
    model = train_matcher_local(featurize(attach_pair_text(train_pairs, ra, rb)))

    def timed(name, df):
        t0 = time.time()
        n = df.count()
        print(json.dumps({"variant": name, "wall_s": round(time.time() - t0, 2),
                          "rows": n, "n_pairs": n_pairs, "cpus": cpus}))
        sys.stdout.flush()

    full = attach_pair_text(labeled, ra, rb)

    # baseline: the attach joins alone (project text cols, no features)
    timed("attach_only", full.select("a_id", "b_id", F.length("a_norm") + F.length("b_norm")))

    # full featurize + local-model scoring (the real score stage)
    timed("full_score", score(model, featurize(full)))

    # featurize without the Jaro-Winkler pandas UDF (JVM-only features)
    no_jw = full.select(
        "a_id", "b_id", "label",
        S.jaccard("a_tokens", "b_tokens").alias("jaccard_tokens"),
        S.dice("a_tokens", "b_tokens").alias("dice_tokens"),
        S.cosine_sets("a_tokens", "b_tokens").alias("cosine_tokens"),
        S.overlap_coefficient("a_tokens", "b_tokens").alias("overlap_tokens"),
        S.levenshtein_sim(F.substring("a_norm", 1, 256), F.substring("b_norm", 1, 256)).alias("levenshtein_sim"),
        (F.least(F.length("a_norm"), F.length("b_norm"))
         / F.greatest(F.length("a_norm"), F.length("b_norm"), F.lit(1)).cast("double")).alias("len_ratio"),
    )
    # sum EVERY retained feature so column pruning can't eliminate any of
    # them — otherwise the variant measures only jaccard+levenshtein, not
    # "featurize minus the JW UDF"
    timed(
        "no_jaro_winkler",
        no_jw.select(
            "a_id",
            F.col("jaccard_tokens") + F.col("dice_tokens") + F.col("cosine_tokens")
            + F.col("overlap_tokens") + F.col("levenshtein_sim") + F.col("len_ratio"),
        ),
    )

    # JVM set sims only (no levenshtein, no UDF)
    sets_only = full.select(
        "a_id",
        S.jaccard("a_tokens", "b_tokens")
        + S.dice("a_tokens", "b_tokens")
        + S.cosine_sets("a_tokens", "b_tokens")
        + S.overlap_coefficient("a_tokens", "b_tokens"),
    )
    timed("set_sims_only", sets_only)

    # levenshtein alone (the O(len^2) JVM DP)
    timed(
        "levenshtein_only",
        full.select("a_id", S.levenshtein_sim(F.substring("a_norm", 1, 256), F.substring("b_norm", 1, 256))),
    )

    # jaro-winkler UDF alone (Arrow transfer + python compute)
    timed(
        "jaro_winkler_only",
        full.select("a_id", S.jaro_winkler_udf(F.substring("a_norm", 1, 64), F.substring("b_norm", 1, 64))),
    )

    spark.stop()


if __name__ == "__main__":
    main()
