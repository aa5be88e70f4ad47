"""Dataset-association for transfer ER (SURVEY A6, the FULL protocol).

The reference's no-label regime picks which LABELED dataset's trained
matcher to reuse for an unlabeled target: it computes each dataset's
post-blocking similarity distribution, histograms every (target, candidate)
pair over a SHARED 100-bin range, Laplace-smooths, and selects the
candidate with minimum KL divergence to the target
(/root/reference/methods/embeddings/entrypoint.py:234-268: np.histogram
bins=100 over the pair's (min, max) range, 'LS' smoothing
``dist + 0.005·sum/100``, scipy entropy = Σ p·ln(p/q)).

Spark-first re-expression: per-dataset min/max/count aggregates → a tiny
broadcast ``ranges`` table → ONE bucketing pass per side (the target is
re-bucketed per candidate because each pair shares a range) → 100-row
per-dataset grids → a single groupBy for the KL sums. Everything is native
Column expressions over counts; cost is O(|pairs| · n_datasets) rows into
two map-side-combined aggregations — no driver-side histogramming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kl_association(
    candidate_sims: DataFrame,
    target_sims: DataFrame,
    dataset_col: str = "dataset",
    sim_col: str = "sim",
    bins: int = 100,
    smoothing: float = 0.005,
    round_dp: int = 6,
) -> DataFrame:
    """→ (dataset, n_pairs, kl_r, rk): KL(target ‖ candidate) per labeled
    candidate dataset, rk = 1 is the selected (argmin-KL) dataset.

    ``candidate_sims``: (dataset, sim) — post-blocking similarity of every
    scored pair of each labeled dataset. ``target_sims``: (sim) — the
    unlabeled target's scored pairs. Histogram range per candidate is the
    SHARED (min, max) of target ∪ candidate like the reference; LS
    smoothing adds ``smoothing·total/bins`` to every bin before
    normalizing. Ties on kl_r break by dataset name for determinism.
    """
    t = target_sims.agg(
        F.min(sim_col).alias("mn"),
        F.max(sim_col).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if int(t["n"]) == 0:
        raise ValueError(
            "kl_association: target_sims is empty — no target distribution "
            "to compare candidate datasets against"
        )
    t_mn, t_mx, t_n = float(t["mn"]), float(t["mx"]), int(t["n"])

    ranges = (
        candidate_sims.groupBy(F.col(dataset_col).alias("dataset"))
        .agg(
            F.min(sim_col).alias("_mn"),
            F.max(sim_col).alias("_mx"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .select(
            "dataset",
            F.least(F.col("_mn"), F.lit(t_mn)).alias("lo"),
            F.greatest(F.col("_mx"), F.lit(t_mx)).alias("hi"),
            "n_pairs",
        )
    )
    # n_datasets rows, referenced three times (both bucketing passes + the
    # grid) — checkpoint so the candidate agg runs once, not per branch
    ranges = ranges.localCheckpoint()

    def bucket(sim):
        width_pos = F.col("hi") > F.col("lo")
        raw = F.floor((sim - F.col("lo")) * bins / (F.col("hi") - F.col("lo")))
        return F.least(F.when(width_pos, raw).otherwise(F.lit(0)), F.lit(bins - 1)).cast("long")

    cand_b = (
        candidate_sims.select(F.col(dataset_col).alias("dataset"), F.col(sim_col).alias("s"))
        .join(F.broadcast(ranges), "dataset")
        .groupBy("dataset", bucket(F.col("s")).alias("b"))
        .agg(F.count(F.lit(1)).alias("qc"))
    )
    targ_b = (
        target_sims.select(F.col(sim_col).alias("s"))
        .crossJoin(F.broadcast(ranges))
        .groupBy("dataset", bucket(F.col("s")).alias("b"))
        .agg(F.count(F.lit(1)).alias("pc"))
    )

    spark = candidate_sims.sparkSession
    grid = ranges.crossJoin(spark.range(bins).select(F.col("id").alias("b")))
    joined = (
        grid.join(targ_b, ["dataset", "b"], "left")
        .join(cand_b, ["dataset", "b"], "left")
        .fillna({"pc": 0, "qc": 0})
    )
    # LS smoothing + normalize: x_b → (c_b + s·T/bins) / (T·(1+s))
    p = (F.col("pc") + F.lit(smoothing * t_n / bins)) / F.lit(t_n * (1.0 + smoothing))
    q = (F.col("qc") + F.col("n_pairs") * F.lit(smoothing / bins)) / (
        F.col("n_pairs") * F.lit(1.0 + smoothing)
    )
    kl = joined.groupBy("dataset", "n_pairs").agg(
        F.round(F.sum(p * F.log(p / q)), round_dp).alias("kl_r")
    )
    # one row per dataset, referenced twice by the rank self-join below
    kl = kl.localCheckpoint()
    # the rank runs over one row per DATASET (a handful, never per pair).
    # A global row_number window would be correct but warns on every run —
    # and partitionBy(lit(1)) doesn't silence it (Catalyst prunes foldable
    # partition keys, leaving the spec empty again). Rank via a broadcast
    # self-join instead: rk = 1 + #rows strictly ahead in the total order
    # (kl_r, dataset), which is unique per row since datasets are distinct.
    ahead = kl.select(
        F.col("kl_r").alias("kl2"), F.col("dataset").alias("ds2")
    )
    return (
        kl.join(
            F.broadcast(ahead),
            (F.col("kl2") < F.col("kl_r"))
            | ((F.col("kl2") == F.col("kl_r")) & (F.col("ds2") < F.col("dataset"))),
            "left",
        )
        .groupBy("dataset", "n_pairs", "kl_r")
        .agg((F.count("ds2") + F.lit(1)).cast("long").alias("rk"))
        .select(
            "dataset",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "kl_r",
            "rk",
        )
    )


def select_training_dataset(
    candidate_sims: DataFrame,
    target_sims: DataFrame,
    dataset_col: str = "dataset",
    sim_col: str = "sim",
    **kw,
) -> str:
    """The association decision itself: name of the argmin-KL dataset —
    the labeled corpus whose trained matcher the target should reuse
    (methods/embeddings/entrypoint.py:234-268 writes the KL table; the
    paper's protocol trains on the minimum-divergence source)."""
    out = kl_association(candidate_sims, target_sims, dataset_col, sim_col, **kw)
    return out.filter(F.col("rk") == 1).collect()[0]["dataset"]
