#!/usr/bin/env python
"""Decompose the minhash signature stage at sf0.1 (run alone)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ertransfer_spark.session import get_spark  # noqa: E402

N, BANDS = 96, 32


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: best {min(ts):.2f}s  runs={['%.2f' % t for t in ts]}", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp_minhash", cpus=32, shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from ertransfer_spark.functions.text import word_shingles

    recs = docs.select(
        F.col("doc_id").cast("long").alias("id"),
        word_shingles("text", n=2).alias("token_set"),
    )
    posts = recs.select(F.col("id").alias("a_id"), F.explode("token_set").alias("tok"))
    n_docs = docs.count()
    n_posts = posts.count()
    print(f"docs={n_docs} postings={n_posts}", flush=True)

    timed("scan_only", lambda: force(docs.select("doc_id")))
    timed("shingle_pass", lambda: force(recs))
    timed("explode_pass", lambda: force(posts))
    timed(
        "groupBy_count_only",
        lambda: force(posts.groupBy("a_id").agg(F.count(F.lit(1)).alias("n"))),
    )
    timed(
        "groupBy_min16",
        lambda: force(
            posts.groupBy("a_id").agg(
                *[F.min(F.hash("tok", F.lit(j))).alias(f"h{j}") for j in range(16)]
            )
        ),
    )
    timed(
        "groupBy_min96",
        lambda: force(
            posts.groupBy("a_id").agg(
                *[F.min(F.hash("tok", F.lit(j))).alias(f"h{j}") for j in range(N)]
            )
        ),
    )
    sig = posts.groupBy("a_id").agg(
        *[F.min(F.hash("tok", F.lit(j))).alias(f"h{j}") for j in range(N)]
    )
    rows = N // BANDS
    band_cols = [
        F.hash(*[F.col(f"h{b * rows + r}") for r in range(rows)]) for b in range(BANDS)
    ]
    timed(
        "sig_plus_bands",
        lambda: force(
            sig.select("a_id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash"))
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
