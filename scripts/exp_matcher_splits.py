"""Matcher-only benchmark on the reference's OWN committed train/test pair
splits (DeepMatcher regime: methods/*/entrypoint.py train on train.csv,
report F1 on test.csv). Measures classification F1 at threshold 0.5 —
directly comparable to published classical (Magellan) baselines.

Usage: python scripts/exp_matcher_splits.py [d1 d2 ...]   (default: all)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATASETS = Path("/root/reference/datasets")

# per-dataset attribute lists (the non-id columns of each pair file's sides)
ATTRS = {
    "d1_fodors_zagats": ["name", "phone_number", "street"],
    "d2_abt_buy": ["name", "description", "price"],
    "d4_dblp_acm": ["title", "authors", "venue", "year"],
    # d5-d7/d10 sides have ASYMMETRIC schemas; listed attrs are the shared
    # ones (intersection enforced below). d5's URI headers normalize to
    # local names in read_pair_split.
    "d5_imdb_tmdb": ["title", "name", "episodeNumber", "seasonNumber", "genre_list"],
    "d6_imdb_tvdb": ["title", "name", "episodeNumber", "seasonNumber"],
    "d7_tmdb_tvdb": ["title", "name", "abstract", "episodeNumber", "seasonNumber", "releaseDate"],
    "d10_imdb_dbpedia": ["title"],
    "d8_amazon_walmart": ["title", "modelno", "price", "brand"],
    "d9_dblp_scholar": ["title", "authors", "venue", "year"],
    "d11_itunes_amazon": [
        "Song_Name", "Artist_Name", "Album_Name", "Genre", "Price", "Time", "Released",
    ],
    "d12_beeradvo_ratebeer": ["Beer_Name", "Brew_Factory_Name", "Style", "ABV"],
}


def matcher_split_eval(spark, name: str, algorithm: str = "rf") -> dict:
    from ertransfer_spark.operators.canonicalize import canonicalize_table
    from ertransfer_spark.operators.matcher import (
        FEATURES,
        attach_pair_text,
        attr_features,
        evaluate_predictions,
        featurize,
        score,
        train_matcher,
    )
    from ertransfer_spark.sources.normalizer import read_pair_split

    d = DATASETS / name
    tr_pairs, tra, trb = read_pair_split(spark, str(d / "train.csv"))
    te_pairs, tea, teb = read_pair_split(spark, str(d / "test.csv"))
    raw_a = tra.unionByName(tea).dropDuplicates(["id"]).localCheckpoint()
    raw_b = trb.unionByName(teb).dropDuplicates(["id"]).localCheckpoint()
    attrs = [c for c in ATTRS[name] if c in raw_a.columns and c in raw_b.columns]
    rec_a = canonicalize_table(raw_a, id_col="id").localCheckpoint()
    rec_b = canonicalize_table(raw_b, id_col="id").localCheckpoint()

    def feats(pairs):
        f = featurize(attach_pair_text(pairs, rec_a, rec_b))
        return attr_features(f, raw_a, raw_b, attrs)

    ftr, names = feats(tr_pairs)
    fte, _ = feats(te_pairs)
    model = train_matcher(
        ftr.localCheckpoint(), algorithm=algorithm, feature_cols=FEATURES + names
    )
    preds = score(model, fte.localCheckpoint())
    return evaluate_predictions(preds, threshold=0.5)


def main():
    from ertransfer_spark.session import get_spark

    which = sys.argv[1:] or sorted(ATTRS)
    spark = get_spark("exp_matcher_splits")
    for short in which:
        name = next(n for n in ATTRS if n == short or n.split("_")[0] == short)
        t0 = time.time()
        m = matcher_split_eval(spark, name)
        print(
            f"{name}: f1={m['f1']:.4f} p={m['precision']:.4f} r={m['recall']:.4f} "
            f"pos={m['pos']:.0f} wall={time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main()
