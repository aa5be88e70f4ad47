"""END-TO-END pipeline evaluation on ALL 12 reference datasets (d9/d11
commit no tableB.csv — it is reconstructed from the pair splits' inline
attributes; see pipeline_eval).

Regime: load tableA/tableB/matches.csv, canonicalize, block per the
reference's own splitter recipe (/root/reference/splitters/KNN-Join/
settings.py:1-12 — clean/QGram/multiset/similarity/reverse; K raised to 5
because a trained matcher consumes the candidates rather than taking the
top-1 directly), train the reference-default RF matcher on a stratified
split of the labeled candidates, score, UMC-cluster, pairwise F1 vs the
committed golden matches.

Usage: python scripts/exp_pipeline_all.py [d5 d8 ...]   (default: all)

Measured 2026-08-19 r5 (local[8], recipes below; RF capacity raised to
numTrees=100/maxDepth=16 on the HARD-TEXTUAL datasets — the default 50/8
underfits the expanded per-attr+tfidf feature set there; the easy/structured
datasets are capacity-flat (d1 0.899, d5 0.905, d6 0.803, d7 0.771,
d9 0.988 measured at 100/16 = same as default within noise), so their
recipes keep the default):
  d1 0.90  d2 0.852 (was 0.823)  d3 0.788 (was 0.703)  d4 0.99
  d5 0.903 (block recall 0.929)  d6 0.799 (br 0.918)  d7 0.771 (br 0.981)
  d8 0.856 (was 0.736; br 0.993 — amazon-walmart is the curated hard case;
            published classical baselines run ~0.33-0.65)
  d9 0.984 (br 0.997 — reconstructed tableB, word-token cosine k=10)
  d10 0.698 (was 0.679; br 0.721 vs the 0.737 content ceiling via union +
             keep_rare_df=100 rare-token pass-through — see recipe note)
  d11 0.268 (was 0.250; br 0.826; the d12 regime squared: 132 golden over
             6907x9282, golden pairs span DIFFERENT remixes while candidate
             distractors are other versions of the same song;
             matcher-split F1 is 0.99)
  d12 0.532 (was 0.489; br 0.794; 68 golden matches over 4346x3001 —
             extreme label scarcity is the regime; matcher-split F1 0.905)
Floors for d5-d8/d10-d12 are pinned in tests/test_reference_datasets.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATASETS = Path("/root/reference/datasets")

# settings.py recipes (recall level 0.90), plus matcher attrs per schema.
# qgram=None → word-token blocking (d4's adaptation: a 2-gram vocabulary is
# ~1.3k symbols so every posting is hot; token cosine + df cap is the
# Spark-first equivalent — see tests/test_reference_datasets.py d4 note).
RECIPES = {
    "d1_fodors_zagats": dict(clean=True, qgram=4, multiset=True, metric="dice",
                             k=5, reverse=True,
                             attrs=["name", "phone_number", "street"]),
    "d2_abt_buy": dict(clean=True, qgram=3, multiset=True, metric="cosine", k=4,
                       attrs=["name", "description", "price"],
                       extra=[("num", "price"), ("ovl", "name")], tfidf=True,
                       train_params={"numTrees": 100, "maxDepth": 16}),
    # d3 is fully rank-bound (zero unreachable golden pairs at k=26;
    # exp_d3_rank.py) and the matcher is the binding stage: RF CAPACITY is
    # the lever — numTrees=100/maxDepth=16 lifts e2e F1 0.703→0.788
    # (precision 0.78→0.93) vs the default 50/8; d12/d16/d20 plateau at
    # ~0.785, 300 shallow trees drop to 0.71. Union blocking k=26/50 lifts
    # block recall (0.9165/0.9465) but NETS F1 down (0.70/0.64) — more
    # confusable candidates overwhelm ranking (same lesson as r4).
    "d3_amazon_google": dict(clean=True, qgram=5, multiset=True, metric="cosine",
                             k=26, reverse=True,
                             attrs=["title", "description", "manufacturer", "price"],
                             extra=[("num", "price"), ("ovl", "title")], tfidf=True,
                             train_params={"numTrees": 100, "maxDepth": 16}),
    "d4_dblp_acm": dict(clean=False, qgram=None, metric="cosine", k=5,
                        max_token_df=500),
    # d5-d7 sides carry long prose columns (dbpedia abstracts): common
    # 5-grams of English text have df ~ corpus/2, so an uncapped posting
    # join is quadratic (measured: single hot partition, >10 min at 5k x 6k).
    # The df cap is the Spark-first analog of the reference's prefix-filter
    # KNN; stop-gram removal costs little recall on near-duplicate pairs.
    # K raised to 10 (matcher consumes candidates); cap=1000 beats 2000 on
    # BOTH recall and wall (stop-grams add noise neighbors, not signal).
    # episode/season NUMERIC distances are the strong discriminators on the
    # TV-episode entities (d5 0.894 -> 0.903).
    "d5_imdb_tmdb": dict(clean=False, qgram=5, multiset=False, metric="cosine",
                         k=10, max_token_df=1000,
                         attrs=["title", "name", "episodeNumber", "seasonNumber"],
                         extra=[("num", "episodeNumber"), ("num", "seasonNumber"),
                                ("ovl", "title")]),
    "d6_imdb_tvdb": dict(clean=False, qgram=5, multiset=False, metric="cosine",
                         k=10, max_token_df=1000, tfidf=True,
                         attrs=["title", "name", "episodeNumber", "seasonNumber"],
                         extra=[("num", "episodeNumber"), ("num", "seasonNumber"),
                                ("ovl", "title"), ("qg3", "name")]),
    "d7_tmdb_tvdb": dict(clean=False, qgram=5, multiset=False, metric="cosine",
                         k=10, max_token_df=1000,
                         attrs=["title", "name", "abstract", "episodeNumber",
                                "seasonNumber", "releaseDate"],
                         extra=[("num", "episodeNumber"), ("num", "seasonNumber"),
                                ("ovl", "title"), ("ovl", "abstract"),
                                ("qg3", "name"), ("qg3", "releaseDate")]),
    "d8_amazon_walmart": dict(clean=True, qgram=4, multiset=True, metric="cosine",
                              k=5, reverse=True,
                              attrs=["title", "modelno", "price", "brand"],
                              extra=[("num", "price"), ("ovl", "title")],
                              tfidf=True,
                              train_params={"numTrees": 100, "maxDepth": 16}),
    # d10 recall CEILING is textual-overlap-bound, not a recipe problem:
    # 26.3% of the 22,148 golden pairs share ZERO word tokens (A rows have
    # NaN titles + a different cast member than B's single actor/director;
    # foreign retitles like "Terminal Station"/"Stazione Termini") and sit
    # at char-3-gram jaccard 0.0175 = noise floor, so NO content-based
    # blocker (token, q-gram, OR token-derived embedding — feature-hashed
    # vectors of disjoint token sets have expected cosine 0) exceeds the
    # 0.737 reachable ceiling; full analysis in exp_d10_rare.py. Sweep:
    # q-grams cost 10x the wall of word tokens for IDENTICAL recall
    # (exp_d10_sweep.py); k=20 single-dir 0.626, k=20 union 0.664
    # (exp_d10_union.py); + keep_rare_df=100 (rare-token pass-through,
    # r5) 0.721 = 0.978 of ceiling, e2e F1 0.651→0.679 at +6% wall
    # (T=200 gives br 0.725 but F1 0.672 and +43% wall — T=100 wins).
    # The committed d10 split is random-negative (recall 1.0 by
    # construction) — the reference's own KNN recall on d10 is unpublished.
    "d10_imdb_dbpedia": dict(clean=False, qgram=None, metric="cosine",
                             k=20, direction="union", max_token_df=4000,
                             keep_rare_df=100,
                             attrs=["title"], extra=[("ovl", "title")],
                             train_params={"numTrees": 100, "maxDepth": 16}),
    # d9/d11 reconstruct tableB from the split inline attrs (see
    # pipeline_eval). d9's settings.py row is qgram=4/reverse/cosine;
    # word tokens measured equal-or-better recall at a fraction of the
    # wall on every text dataset (d10 note), so the recipe uses them.
    "d9_dblp_scholar": dict(clean=False, qgram=None, metric="cosine",
                            k=10, reverse=True, max_token_df=2000,
                            attrs=["title", "authors", "venue", "year"],
                            extra=[("num", "year"), ("ovl", "title"),
                                   ("qg3", "authors")], tfidf=True),
    "d11_itunes_amazon": dict(clean=False, qgram=None, metric="cosine",
                              k=10, reverse=True, tfidf=True,
                              attrs=["Song_Name", "Artist_Name", "Album_Name",
                                     "Time", "Released", "Price"],
                              extra=[("num", "Price"), ("ovl", "Song_Name"),
                                     ("qg3", "Song_Name"), ("qg3", "Time"),
                                     ("date", "Released"),
                                     ("qg3", "Album_Name")],
                              train_params={"numTrees": 100, "maxDepth": 16}),
    # d12 has no settings.py entry (it enters the reference via the
    # DeepMatcher split only); word-token jaccard is the sane default.
    "d12_beeradvo_ratebeer": dict(clean=False, qgram=None, metric="jaccard", k=5,
                                  attrs=["Beer_Name", "Brew_Factory_Name",
                                         "Style", "ABV"],
                                  extra=[("num", "ABV"), ("ovl", "Beer_Name")],
                                  train_params={"numTrees": 100, "maxDepth": 16}),
}


def pipeline_eval(spark, name: str, algorithm: str = "rf") -> dict:
    """Full pipeline on one dataset; returns pairwise metrics + block recall."""
    from pyspark.sql import functions as F

    from ertransfer_spark.functions.text import qgrams
    from ertransfer_spark.operators.blocking import top_k_token_join
    from ertransfer_spark.operators.canonicalize import canonicalize_table
    from ertransfer_spark.operators.clustering import (
        best_threshold,
        pairwise_metrics,
        unique_mapping_clusters,
    )
    from ertransfer_spark.operators.labeling import attach_labels, stratified_split
    from ertransfer_spark.operators.matcher import (
        FEATURES,
        attach_pair_text,
        attr_features,
        featurize,
        score,
        tfidf_cosine,
        train_matcher,
    )
    from ertransfer_spark.sources.normalizer import (
        read_csv_normalized,
        read_matches_normalized,
    )

    r = RECIPES[name]
    d = DATASETS / name
    a = read_csv_normalized(spark, str(d / "tableA.csv"))
    if (d / "tableB.csv").exists():
        b = read_csv_normalized(spark, str(d / "tableB.csv"))
    else:
        # d9/d11 commit no tableB.csv — reconstruct it from the committed
        # pair splits' INLINE attributes (verified: every golden B id
        # appears there and attr values are consistent per id). Caveat,
        # pinned in the test docstring too: the reconstructed corpus is
        # only the splits' B records (golden partners + random negatives),
        # so blocking faces fewer distractors than the reference's full
        # tableB; treat the result as coverage, not a published benchmark.
        from ertransfer_spark.sources.normalizer import read_pair_split

        parts = [
            read_pair_split(spark, str(d / f), prefix_ids=False)[2]
            for f in ("train.csv", "test.csv")
        ]
        b = parts[0].unionByName(parts[1], allowMissingColumns=True).dropDuplicates(
            ["id"]
        )
    golden = read_matches_normalized(spark, str(d / "matches.csv")).select(
        F.concat(F.lit("a_"), F.col("tableA_id")).alias("a_id"),
        F.concat(F.lit("b_"), F.col("tableB_id")).alias("b_id"),
    ).localCheckpoint()

    def canon(df, side):
        rec = canonicalize_table(df, id_col="id", clean=r["clean"]).withColumn(
            "conv_id", F.concat(F.lit(f"{side}_"), F.col("conv_id"))
        )
        if r.get("qgram"):
            rec = rec.withColumn(
                "qg", qgrams(F.col("agValue"), q=r["qgram"],
                             multiset=r.get("multiset", False))
            )
        return rec.localCheckpoint()

    ra, rb = canon(a, "a"), canon(b, "b")
    cand = top_k_token_join(
        ra, rb, k=r["k"], metric=r["metric"],
        tokens_col="qg" if r.get("qgram") else "token_set",
        multiset=bool(r.get("qgram")) and r.get("multiset", False),
        reverse=r.get("reverse", False), direction=r.get("direction"),
        max_token_df=r.get("max_token_df"),
        keep_rare_df=r.get("keep_rare_df"),
        salt=4, salt_hot_product=65536, skinny_postings=True,
    )

    labeled = attach_labels(cand, golden).localCheckpoint()
    n_golden = golden.count()
    block_recall = labeled.filter("label = 1").count() / max(n_golden, 1)

    feats = featurize(attach_pair_text(labeled, ra, rb))
    feature_cols = None
    if r.get("attrs"):
        attrs = [c for c in r["attrs"] if c in a.columns and c in b.columns]
        pa = a.select(F.concat(F.lit("a_"), F.col("id")).alias("id"), *attrs)
        pb = b.select(F.concat(F.lit("b_"), F.col("id")).alias("id"), *attrs)
        feats, names = attr_features(feats, pa, pb, attrs,
                                     extra=r.get("extra", ()))
        feature_cols = FEATURES + names
    if r.get("tfidf"):
        feats = tfidf_cosine(feats, ra, rb)
        feature_cols = (feature_cols or FEATURES) + ["tfidf_cos"]
    feats = feats.localCheckpoint()
    model = train_matcher(stratified_split(feats)["train"], algorithm=algorithm,
                          feature_cols=feature_cols,
                          params=r.get("train_params"))
    preds = score(model, feats).localCheckpoint()
    out = unique_mapping_clusters(preds, best_threshold(preds))
    m = pairwise_metrics(out, golden)
    m["block_recall"] = round(block_recall, 4)
    return m


def main():
    from ertransfer_spark.session import get_spark

    names = sys.argv[1:] or sorted(RECIPES)
    names = [next(k for k in RECIPES if k.startswith(n)) if not (DATASETS / n).exists()
             else n for n in names]
    spark = get_spark("exp-pipeline-all", cpus=8, shuffle_partitions=16)
    for name in names:
        t0 = time.time()
        m = pipeline_eval(spark, name)
        m["dataset"] = name
        m["sec"] = round(time.time() - t0, 1)
        print(json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main()
