"""Threshold-tuning protocol (M4 + A7) tests."""

from __future__ import annotations


def test_tune_threshold_runs(spark):
    from ertransfer_spark.operators.clustering import tune_threshold_runs

    # well-separated probabilities: any threshold in (0.3, 0.7) is perfect
    rows = []
    for i in range(200):
        label = i % 2
        prob = 0.8 + (i % 10) * 0.01 if label else 0.1 + (i % 10) * 0.01
        rows.append((f"a{i}", f"b{i}", label, prob))
    preds = spark.createDataFrame(
        rows, "a_id string, b_id string, label int, prob_class1 double"
    )
    out = tune_threshold_runs(preds, n_runs=5)
    assert out["runs"] == 5
    assert 0.15 <= out["threshold_mean"] <= 0.8
    assert out["f1_mean"] > 0.99
    assert out["f1_std"] < 0.02

    # deterministic under the same seed
    out2 = tune_threshold_runs(preds, n_runs=5)
    assert out == out2


def test_tune_split_is_label_stratified(spark):
    """The tune split takes round(frac·n) of EACH label stratum — exact
    stratification like the reference's train_test_split(stratify=label)
    (clustering/Probabilities/clustering.py:77), not just in expectation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # skewed labels: 30 positives, 270 negatives
    rows = [
        (f"a{i}", f"b{i}", 1 if i < 30 else 0, 0.9 if i < 30 else 0.1)
        for i in range(300)
    ]
    preds = spark.createDataFrame(
        rows, "a_id string, b_id string, label int, prob_class1 double"
    )
    # replicate one run's split exactly as tune_threshold_runs builds it
    seed, r, frac = 42, 0, 0.2
    h = F.xxhash64("a_id", "b_id", F.lit(seed + r))
    w_rank = Window.partitionBy("label").orderBy(h, "a_id", "b_id")
    w_cnt = Window.partitionBy("label")
    ranked = preds.withColumn("_rn", F.row_number().over(w_rank)).withColumn(
        "_cut", F.round(F.count(F.lit(1)).over(w_cnt) * frac)
    )
    tune = ranked.filter(F.col("_rn") <= F.col("_cut"))
    counts = {r["label"]: r["n"] for r in tune.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[1] == round(30 * frac)    # exactly 6 positives
    assert counts[0] == round(270 * frac)   # exactly 54 negatives
