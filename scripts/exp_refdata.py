"""Measure end-to-end pipeline F1 on additional reference datasets before
pinning test floors (d2 abt-buy, d8 amazon-walmart, d12 beeradvo-ratebeer).

Blocking settings from /root/reference/splitters/KNN-Join/settings.py where
present (d2, d8); d12 is not in that table (DeepMatcher-suite dataset) so we
probe a token-cosine config. Usage:

    python scripts/exp_refdata.py [d2] [d8] [d12]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from pyspark.sql import functions as F

from ertransfer_spark.session import get_spark
from test_reference_datasets import _canon, _load, _pipeline_f1


def run(spark, name, *, clean, q, multiset, metric, k, reverse, attrs,
        tokens_from_qgrams=True, max_token_df=None):
    from ertransfer_spark.functions.text import qgrams
    from ertransfer_spark.operators.blocking import top_k_token_join

    a, b, golden = _load(spark, name)
    ra, rb = _canon(a, "a", clean=clean), _canon(b, "b", clean=clean)
    if tokens_from_qgrams:
        ra = ra.withColumn("qg", qgrams(F.col("agValue"), q=q, multiset=multiset))
        rb = rb.withColumn("qg", qgrams(F.col("agValue"), q=q, multiset=multiset))
        tok_col = "qg"
    else:
        tok_col = "token_set"
        multiset = False
    ra, rb = ra.localCheckpoint(), rb.localCheckpoint()
    kw = {}
    if max_token_df:
        kw["max_token_df"] = max_token_df
    t0 = time.time()
    cand = top_k_token_join(
        ra, rb, k=k, metric=metric, tokens_col=tok_col, multiset=multiset,
        reverse=reverse, **kw,
    ).localCheckpoint()
    n_cand = cand.count()
    n_gold = golden.count()
    # blocking recall: candidate pairs that are golden
    hit = cand.join(golden, ["a_id", "b_id"]).count()
    m = _pipeline_f1(spark, ra, rb, golden, cand, raw=(a, b), attrs=attrs)
    print(
        f"{name}: f1={m['f1']:.4f} p={m['precision']:.4f} r={m['recall']:.4f} "
        f"cand={n_cand} block_recall={hit}/{n_gold}={hit / n_gold:.3f} "
        f"wall={time.time() - t0:.1f}s"
    )
    return m


def main():
    which = set(sys.argv[1:]) or {"d2", "d8", "d12"}
    spark = get_spark("exp_refdata")
    if "d2" in which:  # settings.py: clean, QGram=3, multiset, cosine, K=4
        run(spark, "d2_abt_buy", clean=True, q=3, multiset=True,
            metric="cosine", k=4, reverse=False,
            attrs=["name", "description", "price"])
    if "d8" in which:  # settings.py: clean, reverse, QGram=4, multiset, cosine, K=2
        run(spark, "d8_amazon_walmart", clean=True, q=4, multiset=True,
            metric="cosine", k=2, reverse=True,
            attrs=["title", "modelno", "price", "brand"])
    if "d12" in which:  # not in settings.py; probe token cosine
        run(spark, "d12_beeradvo_ratebeer", clean=True, q=3, multiset=True,
            metric="cosine", k=4, reverse=False,
            attrs=["Beer_Name", "Brew_Factory_Name", "Style", "ABV"])


if __name__ == "__main__":
    main()
