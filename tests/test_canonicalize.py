"""Canonicalization invariants (FIXTURES.md §6.1, input_hint per-row invariant)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ertransfer_spark.operators.canonicalize import canonicalize, explode_turns
from ertransfer_spark.oracle import pandas_oracle as oracle


def test_roundtrip_preserves_turn_text(spark, spark_corpora, corpora):
    """Exploding the canonical record reproduces every turn's text in stable
    turn order — the per-row invariant."""
    ta_spark = spark_corpora[0]
    recs = canonicalize(ta_spark, keep_turns=True)
    back = explode_turns(recs).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    orig = (
        corpora[0][["conv_id", "turn_idx", "role", "text", "tool"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back[orig.columns], orig, check_dtype=False)


def test_agvalue_matches_oracle(spark, spark_corpora, corpora):
    recs = canonicalize(spark_corpora[0]).select("conv_id", "agValue").toPandas()
    want = oracle.canonicalize(corpora[0])[["conv_id", "agValue"]]
    got = recs.sort_values("conv_id").reset_index(drop=True)
    want = want.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_canonicalize_sides_matches_per_side(spark, spark_corpora):
    """The single-job union-tagged path (scaling pipeline) is row-identical
    to two per-side canonicalize calls — including when the two sources
    share raw conv_ids (the tag keeps groups side-local)."""
    from ertransfer_spark.operators.canonicalize import canonicalize_sides

    ta, tb = spark_corpora[0], spark_corpora[1]
    # force an id collision: re-key B's rows onto A's id space
    tb_clash = tb.withColumn(
        "conv_id", F.regexp_replace("conv_id", "^b_", "a_")
    )
    for b_side in (tb, tb_clash):
        ra, rb = canonicalize_sides(ta, b_side, checkpoint=False)
        for got_df, want_df in ((ra, canonicalize(ta)), (rb, canonicalize(b_side))):
            got = got_df.select("conv_id", "agValue", "n_tokens").toPandas()
            want = want_df.select("conv_id", "agValue", "n_tokens").toPandas()
            got = got.sort_values("conv_id").reset_index(drop=True)
            want = want.sort_values("conv_id").reset_index(drop=True)
            assert sorted(got_df.columns) == sorted(want_df.columns)
            pd.testing.assert_frame_equal(got, want)


def test_canonicalize_sides_width_guard(spark, spark_corpora):
    """width = max(2 × shuffle partitions, union's input partitions): the
    repartition never shrinks below the input's own parallelism (r3 verdict
    residue — future-proofs AQE-coalesced sessions / very wide scans)."""
    from ertransfer_spark.operators.canonicalize import canonicalize_sides

    ta, tb = spark_corpora[0].coalesce(1), spark_corpora[1].coalesce(1)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        # narrow input (union = 2 partitions): the 2x-shuffle term wins → 8
        ra, _ = canonicalize_sides(ta, tb, checkpoint=True)
        assert ra.rdd.getNumPartitions() == 8
        # input wider than 2x shuffle width (union = 48): guard keeps 48
        ra2, _ = canonicalize_sides(ta.repartition(24), tb.repartition(24), checkpoint=True)
        assert ra2.rdd.getNumPartitions() == 48
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_empty_cleaning_turn_parity(spark):
    """A turn whose text cleans to '' (literal 'nan', whitespace-only, tabs)
    must leave NO double space in agValue, and batch canonicalize must stay
    byte-identical to the pandas oracle on such input (the whitespace-parity
    contract shared with the streaming stateful path)."""
    rows = [
        ("c1", 0, "user", "hello there", "", None),
        ("c1", 1, "agent", "nan", "", None),          # cleans to ''
        ("c1", 2, "user", "  \t ", "", None),          # cleans to ''
        ("c1", 3, "agent", "bye  now", "", None),      # internal collapse
        ("c2", 0, "user", "nan nan", "", None),        # whole conv cleans empty
    ]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["ts"] = pd.Timestamp("2026-01-01")
    from ertransfer_spark.synth import to_spark

    got = {
        r["conv_id"]: r["agValue"]
        for r in canonicalize(to_spark(spark, pdf)).select("conv_id", "agValue").collect()
    }
    assert got["c1"] == "hello there bye now"
    assert got["c2"] == ""
    want = dict(zip(*[oracle.canonicalize(pdf)[c] for c in ("conv_id", "agValue")]))
    assert got == want


def test_agvalue_order_insensitive_to_input_row_order(spark, corpora):
    """Permutation invariance: shuffled input rows → identical agValue."""
    from ertransfer_spark.synth import to_spark

    ta = corpora[0]
    shuffled = ta.sample(frac=1.0, random_state=3).reset_index(drop=True)
    r1 = canonicalize(to_spark(spark, ta)).select("conv_id", "agValue").toPandas()
    r2 = canonicalize(to_spark(spark, shuffled)).select("conv_id", "agValue").toPandas()
    m1 = dict(zip(r1["conv_id"], r1["agValue"]))
    m2 = dict(zip(r2["conv_id"], r2["agValue"]))
    assert m1 == m2
