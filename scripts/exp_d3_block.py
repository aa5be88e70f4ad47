"""d3 blocking-miss analysis (r5): where do the 12.25% missed golden go?

Computes ALL sharing pairs under the d3 recipe's representation (clean=True
5-gram multiset, cosine) — no top-K — then ranks each golden pair from both
sides. Shows: zero-overlap count (unreachable), rank distribution (would a
bigger K / union direction help), and word-token comparison.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

D = Path("/root/reference/datasets/d3_amazon_google")


def main():
    from ertransfer_spark.functions.text import qgrams
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize_table
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.sources.normalizer import (
        read_csv_normalized,
        read_matches_normalized,
    )

    spark = get_spark("exp-d3-block", cpus=8, shuffle_partitions=16)
    a = read_csv_normalized(spark, str(D / "tableA.csv"))
    b = read_csv_normalized(spark, str(D / "tableB.csv"))
    golden = read_matches_normalized(spark, str(D / "matches.csv")).select(
        F.concat(F.lit("a_"), F.col("tableA_id")).alias("a_id"),
        F.concat(F.lit("b_"), F.col("tableB_id")).alias("b_id"),
    ).localCheckpoint()

    def canon(df, side, clean):
        rec = canonicalize_table(df, id_col="id", clean=clean).withColumn(
            "conv_id", F.concat(F.lit(f"{side}_"), F.col("conv_id"))
        ).withColumn("qg", qgrams(F.col("agValue"), q=5, multiset=True))
        return rec.localCheckpoint()

    ra, rb = canon(a, "a", True), canon(b, "b", True)
    # full scored-pair table (k=10^9 → no rank filter): use the operator
    # with huge k to reuse exact semantics, window mode
    scored = top_k_token_join(
        ra, rb, k=1 << 30, metric="cosine", tokens_col="qg", multiset=True,
        salt=2, salt_hot_product=65536,
    ).localCheckpoint()
    wa = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("sim"), F.asc("a_id"))
    rk = scored.withColumn("rka", F.row_number().over(wa)).withColumn(
        "rkb", F.row_number().over(wb))
    g = golden.join(rk, ["a_id", "b_id"], "left").localCheckpoint()
    n = g.count()
    stats = g.agg(
        F.sum(F.col("sim").isNull().cast("int")).alias("zero_overlap"),
        F.sum((F.col("rkb") <= 26).cast("int")).alias("rev26"),
        F.sum((F.col("rka") <= 26).cast("int")).alias("fwd26"),
        F.sum(((F.col("rka") <= 26) | (F.col("rkb") <= 26)).cast("int")).alias("uni26"),
        F.sum(((F.col("rka") <= 50) | (F.col("rkb") <= 50)).cast("int")).alias("uni50"),
        F.expr("percentile(rkb, 0.95)").alias("p95_rkb"),
        F.max("rkb").alias("max_rkb"),
    ).collect()[0]
    print(dict(stats.asDict()), "n_golden:", n, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
