#!/usr/bin/env python
"""Verify the let-bound qgrams/word_shingles forms are value-identical to
the old direct-substitution forms, then measure the perf delta at sf0.1.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ertransfer_spark.functions.text import (  # noqa: E402
    SPARK_BIGRAMS_SQL,
    SPARK_TOKENS_SQL,
    SPARK_TRIGRAMS_SQL,
    normalize,
    qgrams,
    word_shingles,
)
from ertransfer_spark.session import get_spark  # noqa: E402


def old_word_shingles(text_col: str, n: int = 2):
    toks = SPARK_TOKENS_SQL.format(col=text_col)
    tpl = {2: SPARK_BIGRAMS_SQL, 3: SPARK_TRIGRAMS_SQL}[n]
    return F.expr(tpl.format(ts=toks))


def old_qgrams(col, q: int = 3, multiset: bool = False):
    s = normalize(col)
    n = F.length(s)
    grams = F.when(
        n < q, F.when(n > 0, F.array(s)).otherwise(F.array().cast("array<string>"))
    ).otherwise(
        F.transform(F.sequence(F.lit(1), n - F.lit(q - 1)), lambda i: s.substr(i, F.lit(q)))
    )
    return grams if multiset else F.array_distinct(grams)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("exp_letbind", cpus=32, shuffle_partitions=32)

    # --- parity on edge cases + real corpus ---------------------------------
    edge = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a"), (3, "ab"), (4, "one two three two one"),
         (5, "  x  "), (6, "ÜBER weird—chars 123"), (7, "single"),
         (8, "a b"), (9, "aa" * 50)],
        "id int, text string",
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        F.col("doc_id").cast("int").alias("id"), "text"
    )
    for src_name, src in [("edge", edge), ("sf0.01-docs", docs)]:
        for label, old, new in [
            ("bigrams", old_word_shingles("text", 2), word_shingles("text", 2)),
            ("trigrams", old_word_shingles("text", 3), word_shingles("text", 3)),
            ("qg3set", old_qgrams(F.col("text"), 3, False), qgrams(F.col("text"), 3, False)),
            ("qg2ms", old_qgrams(F.col("text"), 2, True), qgrams(F.col("text"), 2, True)),
            ("qg5set", old_qgrams(F.col("text"), 5, False), qgrams(F.col("text"), 5, False)),
        ]:
            bad = src.select("id", old.alias("o"), new.alias("n")).filter(
                ~F.col("o").eqNullSafe(F.col("n"))
            ).count()
            print(f"parity {src_name}/{label}: mismatches={bad}", flush=True)
            assert bad == 0, (src_name, label)

    # --- perf at sf0.1 -------------------------------------------------------
    d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    from ertransfer_spark.operators.dedup import minhash_dedup, minhash_dedup_portable

    recs_old = d1.select(F.col("doc_id").alias("id"), old_word_shingles("text", 2).alias("s"))
    recs_new = d1.select(F.col("doc_id").alias("id"), word_shingles("text", 2).alias("s"))
    force(recs_new)  # warmup
    for name, df in [("shingle_pass_old", recs_old), ("shingle_pass_new", recs_new)]:
        ts = []
        for _ in range(2):
            t0 = time.time(); force(df); ts.append(time.time() - t0)
        print(f"{name}: best {min(ts):.2f}s runs={['%.2f' % t for t in ts]}", flush=True)

    for name, fn in [
        ("minhash_fast", lambda: force(minhash_dedup(d1, min_jaccard=0.5))),
        ("minhash_portable", lambda: force(minhash_dedup_portable(d1, min_jaccard=0.5))),
        ("qgram3_pass", lambda: force(d1.select(qgrams(F.col("text"), 3).alias("g")))),
    ]:
        ts = []
        for _ in range(2):
            t0 = time.time(); fn(); ts.append(time.time() - t0)
        print(f"{name}: best {min(ts):.2f}s runs={['%.2f' % t for t in ts]}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
