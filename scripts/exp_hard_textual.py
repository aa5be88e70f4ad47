"""Probe principled matcher upgrades on the two hard TEXTUAL reference
datasets (d2 abt-buy 0.768, d3 amazon-google 0.618 baseline end-to-end).

Both goldens are measurably perfect 1:1 (1064/1064/1064 and
1102/1102/1102 pairs/distinctA/distinctB), so the UMC 1:1 constraint is
NOT the recall cap — the loss is matcher ranking on hard textual pairs
(d3 block recall 0.886 vs final recall 0.53). Variants probed here, all
JVM-expr / explode-join-agg shapes that scale:

  num     numeric-distance feature on price-like attrs
  ovl     overlap coefficient per attr (asymmetric name-vs-description)
  qg3     3-gram jaccard per short attr
  tfidf   corpus-idf-weighted token cosine on the blob (explode/join/agg)
  gbt     GBT instead of RF
  block+  union blocking (qgram config ∪ word-token cosine top-k)

Measured (2026-08-18, committed winners promoted to
operators/matcher.py attr_features(extra=)/tfidf_cosine):
  d3: baseline 0.618 → +num 0.631 → +num+ovl 0.667 → +num+ovl+tfidf
      0.691 (rf); gbt 0.651 (loses).
  d2: baseline 0.783 → +num+ovl(n)+qg3(n) 0.795 → +num+ovl+tfidf 0.823
      (rf); gbt 0.767 (loses).
  NEGATIVE: d3 union blocking (qgram ∪ word-token k=10) lifts block
  recall only 0.886→0.896 while F1 DROPS to 0.681 — the 4.6k extra
  candidates cost more precision than the 11 recovered golden pairs buy
  recall. Not adopted.

Usage: python scripts/exp_hard_textual.py [d2|d3] [variant ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from pyspark.sql import DataFrame, functions as F

from ertransfer_spark.session import get_spark
from test_reference_datasets import _canon, _load


NUM_RE = r"([0-9]+(?:\.[0-9]+)?)"


def numeric_feature(out: DataFrame, c: str) -> tuple[DataFrame, list[str]]:
    """1 - |a-b|/max(a,b) on the first number in each side, 0 if either
    side has none (presence carried separately)."""
    a_ = F.regexp_extract(F.col(f"_a_{c}"), NUM_RE, 1).try_cast("double")
    b_ = F.regexp_extract(F.col(f"_b_{c}"), NUM_RE, 1).try_cast("double")
    both = a_.isNotNull() & b_.isNotNull() & (F.greatest(a_, b_) > 0)
    out = out.withColumn(
        f"{c}_num",
        F.when(both, 1.0 - F.abs(a_ - b_) / F.greatest(a_, b_)).otherwise(F.lit(0.0)),
    )
    return out, [f"{c}_num"]


def overlap_feature(out: DataFrame, c: str) -> tuple[DataFrame, list[str]]:
    from ertransfer_spark.functions.text import distinct_tokens

    ta, tb = distinct_tokens(F.col(f"_a_{c}")), distinct_tokens(F.col(f"_b_{c}"))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    mn = F.least(F.size(ta), F.size(tb)).cast("double")
    out = out.withColumn(
        f"{c}_ovl", F.when(mn > 0, inter / mn).otherwise(F.lit(0.0))
    )
    return out, [f"{c}_ovl"]


def qgram_feature(out: DataFrame, c: str) -> tuple[DataFrame, list[str]]:
    from ertransfer_spark.functions.text import qgrams

    qa = qgrams(F.col(f"_a_{c}"), q=3, multiset=False)
    qb = qgrams(F.col(f"_b_{c}"), q=3, multiset=False)
    inter = F.size(F.array_intersect(qa, qb)).cast("double")
    union = F.size(F.array_union(qa, qb)).cast("double")
    out = out.withColumn(
        f"{c}_qg3", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    )
    return out, [f"{c}_qg3"]


def tfidf_cosine(pairs: DataFrame, ra: DataFrame, rb: DataFrame) -> DataFrame:
    """Corpus-idf-weighted token cosine over the blob token_set.

    Shape: df over the union corpus (groupBy token), idf joined to each
    side's exploded (id, token) postings, per-id norms aggregated once,
    then one explode-join-agg over the PAIR table for the shared-token
    dot product. Everything is equi-join + partial agg — no driver state,
    no map literal; scales with the posting list like the blocker."""
    toks_a = ra.select(F.col("conv_id").alias("id"), F.explode("token_set").alias("tok"))
    toks_b = rb.select(F.col("conv_id").alias("id"), F.explode("token_set").alias("tok"))
    n_docs = ra.count() + rb.count()
    df_tok = (
        toks_a.unionByName(toks_b)
        .groupBy("tok")
        .agg(F.countDistinct("id").alias("df"))
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
        .select("tok", "idf")
    )
    w_a = toks_a.join(df_tok, "tok").select(F.col("id").alias("a_id"), "tok", "idf")
    w_b = toks_b.join(df_tok, "tok").select(F.col("id").alias("b_id"), "tok", "idf")
    norm_a = w_a.groupBy("a_id").agg(F.sqrt(F.sum(F.col("idf") ** 2)).alias("a_nrm"))
    norm_b = w_b.groupBy("b_id").agg(F.sqrt(F.sum(F.col("idf") ** 2)).alias("b_nrm"))
    dot = (
        pairs.select("a_id", "b_id")
        .join(w_a, "a_id")
        .join(w_b.withColumnRenamed("idf", "idf_b"), ["b_id", "tok"])
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("idf") * F.col("idf_b")).alias("dot"))
    )
    return (
        pairs.join(dot, ["a_id", "b_id"], "left")
        .join(norm_a, "a_id", "left")
        .join(norm_b, "b_id", "left")
        .withColumn(
            "tfidf_cos",
            F.coalesce(
                F.col("dot") / (F.col("a_nrm") * F.col("b_nrm")), F.lit(0.0)
            ),
        )
        .drop("dot", "a_nrm", "b_nrm")
    )


def run_variant(spark, name, attrs, cand, ra, rb, golden, raw,
                extra=(), algorithm="rf", label=""):
    from ertransfer_spark.functions.text import normalize
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
        train_matcher,
    )

    t0 = time.time()
    labeled = attach_labels(cand, golden)
    feats = featurize(attach_pair_text(labeled, ra, rb))
    pa = raw[0].select(F.concat(F.lit("a_"), F.col("id")).alias("id"), *attrs)
    pb = raw[1].select(F.concat(F.lit("b_"), F.col("id")).alias("id"), *attrs)
    feats, names = attr_features(feats, pa, pb, attrs)
    # re-attach normalized attrs for the prototype features
    sa = pa.select(
        F.col("id").alias("a_id"),
        *[normalize(F.col(c).cast("string")).alias(f"_a_{c}") for c in attrs],
    )
    sb = pb.select(
        F.col("id").alias("b_id"),
        *[normalize(F.col(c).cast("string")).alias(f"_b_{c}") for c in attrs],
    )
    feats = feats.join(sa, "a_id").join(sb, "b_id")
    for kind, col in extra:
        if kind == "num":
            feats, n = numeric_feature(feats, col)
        elif kind == "ovl":
            feats, n = overlap_feature(feats, col)
        elif kind == "qg3":
            feats, n = qgram_feature(feats, col)
        elif kind == "tfidf":
            feats = tfidf_cosine(feats, ra, rb)
            n = ["tfidf_cos"]
        names += n
    feats = feats.drop(
        *[f"_a_{c}" for c in attrs], *[f"_b_{c}" for c in attrs]
    ).localCheckpoint()
    model = train_matcher(
        stratified_split(feats)["train"], algorithm=algorithm,
        feature_cols=FEATURES + names,
    )
    preds = score(model, feats).localCheckpoint()
    out = unique_mapping_clusters(preds, best_threshold(preds))
    m = pairwise_metrics(out, golden)
    print(
        f"{name} [{label or 'baseline'} alg={algorithm}]: "
        f"f1={m['f1']:.4f} p={m['precision']:.4f} r={m['recall']:.4f} "
        f"wall={time.time() - t0:.1f}s",
        flush=True,
    )
    return m


def prep(spark, name, *, clean, q, k, reverse, union_token_k=None):
    from ertransfer_spark.functions.text import qgrams
    from ertransfer_spark.operators.blocking import top_k_token_join

    a, b, golden = _load(spark, name)
    ra = _canon(a, "a", clean=clean).withColumn(
        "qg", qgrams(F.col("agValue"), q=q, multiset=True)
    ).localCheckpoint()
    rb = _canon(b, "b", clean=clean).withColumn(
        "qg", qgrams(F.col("agValue"), q=q, multiset=True)
    ).localCheckpoint()
    cand = top_k_token_join(
        ra, rb, k=k, metric="cosine", tokens_col="qg", multiset=True, reverse=reverse
    )
    if union_token_k:
        cand2 = top_k_token_join(
            ra, rb, k=union_token_k, metric="cosine", tokens_col="token_set"
        )
        cand = (
            cand.select("a_id", "b_id")
            .unionByName(cand2.select("a_id", "b_id"))
            .distinct()
        )
    cand = cand.select("a_id", "b_id").distinct().localCheckpoint()
    hit = cand.join(golden, ["a_id", "b_id"]).count()
    n_gold = golden.count()
    print(
        f"{name}: cand={cand.count()} block_recall={hit}/{n_gold}={hit/n_gold:.3f}",
        flush=True,
    )
    return a, b, golden, ra, rb, cand


def main():
    argv = sys.argv[1:]
    which = {w for w in argv if w in {"d2", "d3"}} or {"d3"}
    spark = get_spark("exp_hard_textual")
    if "d3" in which:
        attrs = ["title", "description", "manufacturer", "price"]
        a, b, golden, ra, rb, cand = prep(
            spark, "d3_amazon_google", clean=True, q=5, k=26, reverse=True
        )
        base = dict(attrs=attrs, cand=cand, ra=ra, rb=rb, golden=golden, raw=(a, b))
        run_variant(spark, "d3", **base, label="baseline")
        run_variant(spark, "d3", **base, extra=[("num", "price")], label="+num")
        run_variant(
            spark, "d3", **base,
            extra=[("num", "price"), ("ovl", "title"), ("ovl", "description")],
            label="+num+ovl",
        )
        run_variant(
            spark, "d3", **base,
            extra=[("num", "price"), ("ovl", "title"), ("qg3", "title")],
            label="+num+ovl(t)+qg3(t)",
        )
        run_variant(
            spark, "d3", **base,
            extra=[("num", "price"), ("ovl", "title"), ("tfidf", None)],
            label="+num+ovl+tfidf",
        )
        run_variant(
            spark, "d3", **base,
            extra=[("num", "price"), ("ovl", "title"), ("tfidf", None)],
            algorithm="gbt", label="+num+ovl+tfidf",
        )
    if "d2" in which:
        attrs = ["name", "description", "price"]
        a, b, golden, ra, rb, cand = prep(
            spark, "d2_abt_buy", clean=True, q=3, k=4, reverse=False
        )
        base = dict(attrs=attrs, cand=cand, ra=ra, rb=rb, golden=golden, raw=(a, b))
        run_variant(spark, "d2", **base, label="baseline")
        run_variant(
            spark, "d2", **base,
            extra=[("num", "price"), ("ovl", "name"), ("qg3", "name")],
            label="+num+ovl(n)+qg3(n)",
        )
        run_variant(
            spark, "d2", **base,
            extra=[("num", "price"), ("ovl", "name"), ("tfidf", None)],
            label="+num+ovl+tfidf",
        )
        run_variant(
            spark, "d2", **base,
            extra=[("num", "price"), ("ovl", "name"), ("tfidf", None)],
            algorithm="gbt", label="+num+ovl+tfidf",
        )


if __name__ == "__main__":
    main()
