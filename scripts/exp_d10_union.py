"""d10 union-direction blocking recall: per-A top-K ∪ per-B top-K.

pyJedAI's TopKJoin prunes the similarity graph per NODE (both datasets'
entities keep K neighbors), so the candidate set is the union of both
directions — not the single-direction budget our reverse flag picks.
Measures word-token cosine (q-grams measured identical recall at 10x the
wall in exp_d10_sweep.py).

CONCLUSION (2026-08-18, /tmp/d10_union.log): fwd k=5 0.585 / union k=5
0.613 / union k=10 0.639 / union k=20 0.664 (757k candidates, 110 s).
Union landed as top_k_token_join(direction="union") — one shared pair
agg, two top-K passes.
"""

from __future__ import annotations

import json
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
    from ertransfer_spark.operators.labeling import attach_labels
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.sources.normalizer import (
        read_csv_normalized,
        read_matches_normalized,
    )

    spark = get_spark("exp-d10-union", cpus=8, shuffle_partitions=16)
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

    def run(k, direction):
        kw = dict(
            k=k, metric="cosine", tokens_col="token_set", multiset=False,
            max_token_df=4000, salt=4, salt_hot_product=65536,
            skinny_postings=True,
        )
        t0 = time.time()
        if direction == "union":
            fwd = top_k_token_join(ra, rb, reverse=False, **kw)
            rev = top_k_token_join(ra, rb, reverse=True, **kw)
            cand = fwd.unionByName(rev).dropDuplicates(["a_id", "b_id"])
        else:
            cand = top_k_token_join(ra, rb, reverse=(direction == "rev"), **kw)
        lab = attach_labels(cand, golden)
        n_cand = lab.count()
        hit = lab.filter("label = 1").count()
        print(json.dumps({"k": k, "direction": direction,
                          "recall": round(hit / n_golden, 4),
                          "cands": n_cand, "sec": round(time.time() - t0, 1)}),
              flush=True)

    for k, direction in [(5, "fwd"), (5, "union"), (10, "union"), (20, "union")]:
        run(k, direction)
    spark.stop()


if __name__ == "__main__":
    main()
