"""d10 rare-token pass-through: union k=20 + keep_rare_df sweep.

Ceiling context (duckdb, 2026-08-19): 5,823/22,148 golden pairs (26.3%)
share ZERO word tokens across ALL attributes — alias cast names, foreign
retitles, NULL titles; 2,151 of those also share zero char-3-grams and the
rest sit at 3-gram jaccard 0.0175 (noise floor) — so ~0.737 is the
information-theoretic recall ceiling for ANY content-based blocker.
Within the reachable 16,325: pairs whose min shared-token df_a+df_b <= T
number 12,603 (T=20) / 14,764 (50) / 15,564 (100) / 15,940 (200) /
16,137 (500); pass-through channel volume 155k/490k/1.05M/2.1M/4.8M pairs.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

D = Path("/root/reference/datasets/d10_imdb_dbpedia")


def main():
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize_table
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.sources.normalizer import (
        read_csv_normalized,
        read_matches_normalized,
    )

    spark = get_spark("exp-d10-rare", cpus=8, shuffle_partitions=16)
    a = read_csv_normalized(spark, str(D / "tableA.csv"))
    b = read_csv_normalized(spark, str(D / "tableB.csv"))
    golden = read_matches_normalized(spark, str(D / "matches.csv")).select(
        F.concat(F.lit("a_"), F.col("tableA_id")).alias("a_id"),
        F.concat(F.lit("b_"), F.col("tableB_id")).alias("b_id"),
    ).localCheckpoint()
    n_golden = golden.count()

    def canon(df, side):
        rec = canonicalize_table(df, id_col="id", clean=False).withColumn(
            "conv_id", F.concat(F.lit(f"{side}_"), F.col("conv_id"))
        )
        return rec.localCheckpoint()

    ra, rb = canon(a, "a"), canon(b, "b")

    for rare_df in (None, 100, 200, 400):
        t0 = time.time()
        cand = top_k_token_join(
            ra, rb, k=20, metric="cosine", tokens_col="token_set",
            multiset=False, max_token_df=4000, salt=4,
            salt_hot_product=65536, skinny_postings=True,
            direction="union", keep_rare_df=rare_df,
        ).select("a_id", "b_id").localCheckpoint()
        n_cand = cand.count()
        hits = cand.join(golden, ["a_id", "b_id"]).count()
        print(f"keep_rare_df={rare_df}: cand={n_cand} recall={hits/n_golden:.4f} "
              f"({hits}/{n_golden}) wall={time.time()-t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
