"""Block-recall sweep for d10 (imdb-dbpedia, 26k x 23k, 22k matches).

The settings.py recipe (qgram=4, k=5, reverse, cap=4000) measured block
recall 0.559 — far under the reference's 0.90 recall-level label. Sweep
the blocking knobs cheaply (recall only, no matcher).

CONCLUSION (2026-08-18, /tmp/d10_sweep.log): recall is ceiling-bound, not
knob-bound — 26.7% of golden pairs share ZERO word tokens (measured in
exp_pipeline_all.py's d10 note), so ~0.73 is the max for ANY token
blocker. q-grams: k=5 0.559 (673 s) / k=20 0.632 (1039 s). Word tokens:
k=5 0.557 (72 s) / k=20 0.626 (72 s) — identical recall at 10x less wall.
Union direction (exp_d10_union.py) adds ~0.04: k=20 union 0.664 ≈ 0.91 of
reachable pairs → the pinned recipe.
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
    from ertransfer_spark.functions.text import qgrams
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize_table
    from ertransfer_spark.operators.labeling import attach_labels
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.sources.normalizer import (
        read_csv_normalized,
        read_matches_normalized,
    )

    spark = get_spark("exp-d10", cpus=8, shuffle_partitions=16)
    a = read_csv_normalized(spark, str(D / "tableA.csv"))
    b = read_csv_normalized(spark, str(D / "tableB.csv"))
    golden = read_matches_normalized(spark, str(D / "matches.csv")).select(
        F.concat(F.lit("a_"), F.col("tableA_id")).alias("a_id"),
        F.concat(F.lit("b_"), F.col("tableB_id")).alias("b_id"),
    ).localCheckpoint()
    n_golden = golden.count()

    def canon(df, side, clean, q):
        rec = canonicalize_table(df, id_col="id", clean=clean).withColumn(
            "conv_id", F.concat(F.lit(f"{side}_"), F.col("conv_id"))
        )
        if q:
            rec = rec.withColumn("qg", qgrams(F.col("agValue"), q=q, multiset=False))
        return rec.localCheckpoint()

    grids = [
        dict(q=4, k=5, reverse=True, cap=4000),      # committed recipe
        dict(q=4, k=5, reverse=True, cap=16000),
        dict(q=4, k=10, reverse=True, cap=8000),
        dict(q=4, k=20, reverse=True, cap=8000),
        dict(q=None, k=5, reverse=True, cap=4000),   # word tokens
        dict(q=None, k=10, reverse=True, cap=4000),
        dict(q=None, k=20, reverse=True, cap=4000),
    ]
    cache = {}
    for g in grids:
        key = g["q"]
        if key not in cache:
            cache[key] = (canon(a, "a", False, key), canon(b, "b", False, key))
        ra, rb = cache[key]
        t0 = time.time()
        cand = top_k_token_join(
            ra, rb, k=g["k"], metric="cosine",
            tokens_col="qg" if g["q"] else "token_set",
            multiset=False, reverse=g["reverse"], max_token_df=g["cap"],
            salt=4, salt_hot_product=65536, skinny_postings=True,
        )
        lab = attach_labels(cand, golden)
        n_cand = lab.count()
        hit = lab.filter("label = 1").count()
        print(json.dumps({**g, "recall": round(hit / n_golden, 4),
                          "cands": n_cand, "sec": round(time.time() - t0, 1)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
