"""d3 amazon-google matcher-ranking experiment (r5, VERDICT #3).

d3's golden is a perfect 1:1 mapping (1,102 pairs = max bipartite), so e2e
F1 loss decomposes into blocking recall + matcher ranking. Variants over
the r4 recipe (qgram=5 multiset cosine k=26 reverse, attrs+num/ovl+tfidf,
rf, best_threshold): algorithm sweep, feature extensions, rare-gram
pass-through, select_matcher/tune protocol.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import exp_pipeline_all as X  # noqa: E402


def main():
    from ertransfer_spark.session import get_spark

    spark = get_spark("exp-d3", cpus=8, shuffle_partitions=16)
    base = dict(X.RECIPES["d3_amazon_google"])
    variants = {
        "baseline_rf": {},
        "gbt": {"_algorithm": "gbt"},
        "logreg": {"_algorithm": "logreg"},
        "rare50": {"keep_rare_df": 50},
        "feats+": {"extra": [("num", "price"), ("ovl", "title"),
                              ("qg3", "title"), ("ovl", "description"),
                              ("qg3", "manufacturer")]},
        "feats+_rare50": {"keep_rare_df": 50,
                           "extra": [("num", "price"), ("ovl", "title"),
                                     ("qg3", "title"), ("ovl", "description"),
                                     ("qg3", "manufacturer")]},
    }
    for name, over in variants.items():
        algo = over.pop("_algorithm", "rf")
        X.RECIPES["d3_amazon_google"] = {**base, **over}
        t0 = time.time()
        m = X.pipeline_eval(spark, "d3_amazon_google", algorithm=algo)
        m["variant"] = name
        m["sec"] = round(time.time() - t0, 1)
        print(json.dumps(m), flush=True)
    X.RECIPES["d3_amazon_google"] = base
    spark.stop()


if __name__ == "__main__":
    main()
