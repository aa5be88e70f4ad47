#!/usr/bin/env python
"""A/B: baseline posting self-join vs prefix-filtered set-similarity join
for dedup_shingle_jaccard (threshold Jaccard self-join).

Prefix-filter principle (public: Chaudhuri et al. ICDE'06 primitive
similarity-join operator; Xiao et al. WWW'08 PPJoin; Vernica et al.
SIGMOD'10 MapReduce set-similarity join): order each record's gram set by
a global total order (ascending document frequency, ties by gram value);
any pair with Jaccard >= t must share at least one gram within each
record's first floor((1-t)*|s|)+1 grams. Join only those prefix postings,
dedup candidates, then verify the EXACT Jaccard by intersecting the full
(sorted, distinct) gram-hash arrays.

We pad the prefix with t_pad slightly below the output threshold so the
round(...,6)-then->=0.6 output contract cannot disagree at the boundary.

Usage: python scripts/exp_prefix_join.py [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import __spark_entry__ as E
from ertransfer_spark.session import get_spark

THRESH = 0.6
T_PAD = 0.59  # prefix sized for a slightly lower threshold (rounding guard)


def prefix_variant(spark, sf_dir):
    d = E._doc_shingles(spark, sf_dir)
    h = d.select(
        "id",
        "sz",
        F.expr("transform(s, x -> xxhash64(x))").alias("hs"),
    )
    posts = h.select("id", F.explode("hs").alias("g"))
    dfreq = posts.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    keep = dfreq.filter(F.col("df") <= E.MAX_GRAM_DF)
    # global order: (df asc, g asc). Sort each doc's grams by that order by
    # re-collecting (df, g) structs per id, then slice the prefix.
    ranked = (
        posts.join(F.broadcast(keep), "g")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("rg"))
        .join(h.select("id", "sz"), "id")
    )
    plen = (F.floor((1.0 - T_PAD) * F.col("sz")) + 1).cast("int")
    prefix = ranked.select(
        "id",
        F.expr("transform(rg, x -> x.g)").alias("ordered"),
        plen.alias("plen"),
    ).select("id", F.explode(F.slice("ordered", 1, F.col("plen"))).alias("g"))
    cand = (
        prefix.select(F.col("id").alias("a_id"), "g")
        .join(prefix.select(F.col("id").alias("b_id"), "g"), "g")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    arrs = h.select("id", F.array_sort("hs").alias("arr"), "sz")
    pairs = (
        cand.join(
            F.broadcast(arrs.select(F.col("id").alias("a_id"), F.col("arr").alias("a_arr"), F.col("sz").alias("a_sz"))),
            "a_id",
        )
        .join(
            F.broadcast(arrs.select(F.col("id").alias("b_id"), F.col("arr").alias("b_arr"), F.col("sz").alias("b_sz"))),
            "b_id",
        )
        .withColumn("overlap", F.size(F.array_intersect("a_arr", "b_arr")).cast("long"))
    )
    sim_r = F.round(F.col("overlap") / (F.col("a_sz") + F.col("b_sz") - F.col("overlap")), 6)
    return (
        pairs.withColumn("sim_r", sim_r)
        .filter(F.col("sim_r") >= THRESH)
        .select("a_id", "b_id", "sim_r")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("exp_prefix", cpus=32, shuffle_partitions=32)

    base = E.q_dedup_shingle_jaccard(spark, sf_dir)
    pref = prefix_variant(spark, sf_dir)

    # equality check first (cold-cache effects then shared by both timings)
    b = {tuple(r) for r in base.collect()}
    p = {tuple(r) for r in pref.collect()}
    print(f"baseline rows={len(b)} prefix rows={len(p)} equal={b == p}")
    if b != p:
        print("  only-base:", sorted(b - p)[:5])
        print("  only-pref:", sorted(p - b)[:5])

    for rep in range(reps):
        for name, q in (("base", E.q_dedup_shingle_jaccard), ("pref", lambda s, d: prefix_variant(s, d))):
            t0 = time.time()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"rep{rep} {name}: {time.time() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
