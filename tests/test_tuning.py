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
