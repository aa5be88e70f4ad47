"""d11 itunes-amazon ceiling analysis (r5, VERDICT #4).

d11's regime: 132 golden pairs over 6907x9282, where golden pairs span
DIFFERENT remixes/releases of a song (durations, prices, release dates
differ) while the candidate pool is full of OTHER versions of the SAME
song (near-identical titles/artists). This script quantifies the ranking
ceiling: for each golden pair (a,b), how many distractors b' rank at or
above b by full-record token jaccard — if the golden partner is rarely
rank-1, no lexical matcher + mutual-best clustering can pick it.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from pyspark.sql import functions as F  # noqa: E402


def main():
    import exp_pipeline_all as X
    from ertransfer_spark.operators.canonicalize import canonicalize_table
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.sources.normalizer import (
        read_csv_normalized,
        read_matches_normalized,
        read_pair_split,
    )

    spark = get_spark("exp-d11", cpus=8, shuffle_partitions=16)
    d = X.DATASETS / "d11_itunes_amazon"
    a = read_csv_normalized(spark, str(d / "tableA.csv"))
    parts = [read_pair_split(spark, str(d / f), prefix_ids=False)[2]
             for f in ("train.csv", "test.csv")]
    b = parts[0].unionByName(parts[1], allowMissingColumns=True).dropDuplicates(["id"])
    golden = read_matches_normalized(spark, str(d / "matches.csv")).select(
        F.col("tableA_id").alias("a_id"), F.col("tableB_id").alias("b_id")
    ).localCheckpoint()

    def canon(df):
        return canonicalize_table(df, id_col="id", clean=False).select(
            F.col("conv_id").alias("id"),
            F.array_distinct("token_set").alias("ts"),
        ).localCheckpoint()

    ra, rb = canon(a), canon(b)
    # all-pairs jaccard from A-golden records to every B record (132 x 9282
    # — tiny), rank the golden partner
    ga = golden.select("a_id").distinct().join(
        ra.withColumnRenamed("id", "a_id"), "a_id"
    )
    sim = ga.crossJoin(rb.withColumnRenamed("id", "b_id").withColumnRenamed("ts", "tsb")).select(
        "a_id", "b_id",
        (F.size(F.array_intersect("ts", "tsb")) /
         F.size(F.array_union("ts", "tsb"))).alias("jac"),
    )
    from pyspark.sql import Window
    w = Window.partitionBy("a_id").orderBy(F.desc("jac"), F.asc("b_id"))
    ranked = sim.withColumn("rk", F.row_number().over(w))
    g = ranked.join(golden, ["a_id", "b_id"])
    stats = g.select(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("rk") == 1).cast("int")).alias("rank1"),
        F.sum((F.col("rk") <= 5).cast("int")).alias("rank5"),
        F.sum((F.col("rk") <= 10).cast("int")).alias("rank10"),
        F.expr("percentile(rk, 0.5)").alias("median_rank"),
    ).collect()[0]
    print(dict(stats.asDict()), flush=True)
    # how many ties at the top? sample golden pairs where rank > 1 with the
    # rank-1 distractor alongside
    top = ranked.filter("rk = 1").select("a_id", F.col("b_id").alias("top_b"), F.col("jac").alias("top_jac"))
    worst = (g.filter("rk > 1").join(top, "a_id")
             .select("a_id", "b_id", "jac", "rk", "top_b", "top_jac")
             .orderBy(F.desc("rk")).limit(8).collect())
    for r in worst:
        print(dict(r.asDict()), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
