"""Evidence that the max_token_df quadratic-blowup guard BINDS at a given
corpus size: reproduce the scaling pipeline's posting lists (canonicalize ->
shingle_set -> explode distinct shingles) at n_conv conversations and report

  - distinct join-able tokens (present on both sides),
  - how many are dropped by the df cap (df_a > cap or df_b > cap),
  - the comparison mass sum(df_a * df_b) the cap removes vs keeps.

The cap is the guard documented in CLAUDE.md / BENCH.md: head-vocabulary
stop-shingles' df grows ~linearly with corpus size, so their join output
grows QUADRATICALLY; max_token_df bounds every block to <= cap^2 pairs.
Inactive below ~240k convs by construction — this script is the measurement
that it is ACTIVE at the sizes the scaling runs claim it for.

Usage: python scripts/exp_dfcap.py [n_conv] [cap] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 720_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from ertransfer_spark.operators.canonicalize import canonicalize_sides
    from ertransfer_spark.session import get_spark
    from ertransfer_spark.synth import SynthConfig, generate_spark

    spark = get_spark("exp_dfcap", cpus=cpus, shuffle_partitions=max(cpus * 2, 64))
    sa, sb, _ = generate_spark(spark, SynthConfig(n_conversations=n_conv, seed=42))
    ra, rb = canonicalize_sides(sa, sb)

    def df_of(records, side):
        return (
            records.select(F.explode(F.array_distinct("shingle_set")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(f"df_{side}"))
        )

    both = df_of(ra, "a").join(df_of(rb, "b"), "token")
    agg = both.agg(
        F.count(F.lit(1)).alias("joinable_tokens"),
        F.sum(
            F.when((F.col("df_a") > cap) | (F.col("df_b") > cap), 1).otherwise(0)
        ).alias("capped_tokens"),
        F.max("df_a").alias("max_df_a"),
        F.max("df_b").alias("max_df_b"),
        F.sum(F.col("df_a").cast("long") * F.col("df_b")).alias("pairs_uncapped"),
        F.sum(
            F.when(
                (F.col("df_a") <= cap) & (F.col("df_b") <= cap),
                F.col("df_a").cast("long") * F.col("df_b"),
            ).otherwise(0)
        ).alias("pairs_kept"),
    ).collect()[0]

    out = {
        "n_conv": n_conv,
        "cap": cap,
        "joinable_tokens": agg["joinable_tokens"],
        "capped_tokens": agg["capped_tokens"],
        "max_df_a": agg["max_df_a"],
        "max_df_b": agg["max_df_b"],
        "pairs_uncapped": agg["pairs_uncapped"],
        "pairs_kept": agg["pairs_kept"],
        "pairs_removed_pct": round(
            100.0 * (agg["pairs_uncapped"] - agg["pairs_kept"]) / agg["pairs_uncapped"],
            2,
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
