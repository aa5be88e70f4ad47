"""A6 full-protocol dataset association (operators/transfer.py) and the
M2 external-scorer seam (matcher.score_external)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _sims_df(spark, rows, with_dataset=True):
    if with_dataset:
        return spark.createDataFrame(rows, "dataset string, sim double")
    return spark.createDataFrame([(s,) for s in rows], "sim double")


def test_kl_association_picks_closest(spark):
    """Three candidate distributions; the target is drawn like candidate
    'mid' — argmin-KL must select it."""
    from ertransfer_spark.operators.transfer import kl_association, select_training_dataset

    rng = random.Random(17)
    rows = []
    for _ in range(600):
        rows.append(("low", round(rng.uniform(0.0, 0.3), 6)))
        rows.append(("mid", round(rng.uniform(0.3, 0.7), 6)))
        rows.append(("high", round(rng.uniform(0.7, 1.0), 6)))
    target = [round(rng.uniform(0.3, 0.7), 6) for _ in range(500)]

    cand = _sims_df(spark, rows)
    targ = _sims_df(spark, target, with_dataset=False)
    out = kl_association(cand, targ).collect()
    by_rank = {r["rk"]: r["dataset"] for r in out}
    assert by_rank[1] == "mid"
    assert select_training_dataset(cand, targ) == "mid"


def test_kl_association_empty_target_raises(spark):
    """An empty target distribution has no min/max — float(None) would
    TypeError deep in the range math; the guard raises a clear error."""
    import pytest as _pt

    from ertransfer_spark.operators.transfer import kl_association

    cand = _sims_df(spark, [("only", 0.5)])
    targ = _sims_df(spark, [], with_dataset=False).limit(0)
    with _pt.raises(ValueError, match="empty"):
        kl_association(cand, targ)


def test_kl_association_matches_reference_numpy(spark):
    """kl_r equals the reference's own recipe — np.histogram(bins=100,
    shared range), LS smoothing dist + 0.005·sum/100, entropy Σ p·ln(p/q)
    (methods/embeddings/entrypoint.py:234-268) — to 6 dp."""
    import math

    import numpy as np

    from ertransfer_spark.operators.transfer import kl_association

    rng = random.Random(3)
    cand_sims = {
        "x": [round(rng.betavariate(2, 5), 6) for _ in range(400)],
        "y": [round(rng.betavariate(5, 2), 6) for _ in range(300)],
    }
    target = [round(rng.betavariate(3, 3), 6) for _ in range(350)]

    rows = [(d, s) for d, sims in cand_sims.items() for s in sims]
    got = {
        r["dataset"]: r["kl_r"]
        for r in kl_association(
            _sims_df(spark, rows), _sims_df(spark, target, with_dataset=False)
        ).collect()
    }

    for d, sims in cand_sims.items():
        lo = min(min(target), min(sims))
        hi = max(max(target), max(sims))
        p_cnt, _ = np.histogram(np.array(target), bins=100, range=(lo, hi))
        q_cnt, _ = np.histogram(np.array(sims), bins=100, range=(lo, hi))
        p = p_cnt + 0.005 * p_cnt.sum() / 100
        p = p / p.sum()
        q = q_cnt + 0.005 * q_cnt.sum() / 100
        q = q / q.sum()
        want = float(np.sum(p * np.log(p / q)))
        assert math.isclose(got[d], round(want, 6), abs_tol=2e-6), (d, got[d], want)


def test_association_then_train_on_selected(spark):
    """End-to-end transfer protocol: two labeled corpora with different
    perturbation regimes + an unlabeled target shaped like corpus 'clean'.
    KL association must select 'clean', and a matcher trained on the
    selected corpus must transfer to the target (pairwise F1 ≥ 0.9)."""
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize
    from ertransfer_spark.operators.clustering import (
        best_threshold,
        pairwise_metrics,
        unique_mapping_clusters,
    )
    from ertransfer_spark.operators.labeling import attach_labels, referential_filter
    from ertransfer_spark.operators.matcher import (
        attach_pair_text,
        featurize,
        score,
        train_matcher,
    )
    from ertransfer_spark.operators.transfer import select_training_dataset
    from ertransfer_spark.synth import SynthConfig, generate, to_spark

    def corpus(cfg):
        ta, tb, m = generate(cfg)
        ra = canonicalize(to_spark(spark, ta)).localCheckpoint()
        rb = canonicalize(to_spark(spark, tb)).localCheckpoint()
        golden = referential_filter(spark.createDataFrame(m), ra, rb)
        labeled = attach_labels(
            top_k_token_join(ra, rb, k=5, metric="jaccard"), golden
        ).localCheckpoint()
        return ra, rb, golden, labeled

    clean = SynthConfig(n_conversations=120, seed=21, dropout=0.05, synonym_p=0.05)
    noisy = SynthConfig(n_conversations=120, seed=22, dropout=0.45, synonym_p=0.6,
                        truncate_p=0.6)
    target_cfg = SynthConfig(n_conversations=120, seed=23, dropout=0.05, synonym_p=0.05)

    ra_c, rb_c, gold_c, lab_c = corpus(clean)
    ra_n, rb_n, gold_n, lab_n = corpus(noisy)
    ra_t, rb_t, gold_t, lab_t = corpus(target_cfg)

    cand = lab_c.select(F.lit("clean").alias("dataset"), F.col("sim")).unionByName(
        lab_n.select(F.lit("noisy").alias("dataset"), F.col("sim"))
    )
    targ = lab_t.select("sim")
    assert select_training_dataset(cand, targ) == "clean"

    # train on the SELECTED corpus, score the target's candidates
    model = train_matcher(featurize(attach_pair_text(lab_c, ra_c, rb_c)))
    preds = score(model, featurize(attach_pair_text(lab_t, ra_t, rb_t)))
    accepted = unique_mapping_clusters(preds, best_threshold(preds))
    m = pairwise_metrics(accepted, gold_t)
    assert m["f1"] >= 0.9, m


def test_score_external_seam(spark):
    """M2 seam: an injected external pair scorer (deterministic stand-in
    pandas UDF over the serialize_pair [SEP] contract) produces a valid
    predictions table that drives clustering to high F1 — demonstrating a
    transformer scorer can be slotted in with no pipeline change."""
    from pyspark.sql.functions import pandas_udf

    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize
    from ertransfer_spark.operators.clustering import pairwise_metrics, unique_mapping_clusters
    from ertransfer_spark.operators.labeling import attach_labels, referential_filter
    from ertransfer_spark.operators.matcher import attach_pair_text, score_external
    from ertransfer_spark.synth import SynthConfig, generate, to_spark

    ta, tb, m = generate(SynthConfig(n_conversations=150, seed=31))
    ra = canonicalize(to_spark(spark, ta)).localCheckpoint()
    rb = canonicalize(to_spark(spark, tb)).localCheckpoint()
    golden = referential_filter(spark.createDataFrame(m), ra, rb)
    labeled = attach_labels(top_k_token_join(ra, rb, k=5), golden)
    pairs_text = attach_pair_text(labeled, ra, rb)

    @pandas_udf("double")
    def fake_lm_scorer(pair_text: pd.Series) -> pd.Series:
        # stand-in for a broadcast fine-tuned LM: consumes the exact
        # '[SEP]'-serialized contract a transformer matcher would see
        def prob(s: str) -> float:
            a, _, b = s.partition(" [SEP] ")
            sa, sb = set(a.split()), set(b.split())
            return len(sa & sb) / max(1, len(sa | sb))

        return pair_text.map(prob)

    preds = score_external(pairs_text, fake_lm_scorer)
    assert set(preds.columns) == {"a_id", "b_id", "label", "prob_class1"}
    accepted = unique_mapping_clusters(preds, threshold=0.5)
    met = pairwise_metrics(accepted, golden)
    assert met["f1"] >= 0.9, met
