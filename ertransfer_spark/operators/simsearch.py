"""Similarity search over embedding columns (array<float>).

Reference precedent: DeepBlocker's exact top-K vector pairing
(/root/reference/splitters/DeepBlocker/splitter.py:62-73, dense cosine
matmul) and the sentence-BERT similarity scorer
(/root/reference/methods/embeddings/get_similarity.py:4-10).

Two paths, same contract (query_id, nbr_id, sim_r):

- brute_force_topk — exact baseline. Broadcast the (small) query side,
  cross-join against the corpus, cosine as a native zip_with/aggregate
  expression, per-query top-k window. Wall cost O(|Q|·|corpus|·d) spread
  across executors; correct at any scale where |Q| is bounded.
- lsh_topk — the scale path: random-hyperplane LSH. Each vector is
  bucketed by the sign pattern of `n_planes` fixed pseudo-random
  hyperplanes (deterministic, seeded, generated JVM-side from
  hash(dim_index, plane, seed) — no Python, no model file). Candidates
  share a bucket in ≥1 of `n_tables` tables; exact cosine re-rank after.
  Shuffle width O(vectors × tables), candidates ∝ collisions.

Ranking uses ROUNDED similarity (6 dp) with id tie-break so ordering is
reproducible across engines and float-summation orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(vec_col)
    return df.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Exact cosine top-k → (query_id, nbr_id, sim_r).

    Self-matches (same id) are excluded. The query matrix is collected and
    broadcast as a numpy array (callers bound |Q| — a probe set); the
    corpus streams through an Arrow-batched mapInPandas doing ONE float64
    matmul per batch (the north-rule vectorized-UDF path; the
    zip_with/aggregate Column form allocates per-pair arrays and is ~10×
    slower).

    Exactness of the per-batch prefilter: a corpus row can only reach the
    global top-k if its sim is within one rounding step of the batch's
    k-th largest sim (k better rows in its own batch already dominate it
    at the final rounded ranking). The final round+rank happens in Spark
    expressions so tie-breaks are identical to the SQL oracle.
    """
    import numpy as np
    import pandas as pd

    q_pdf = queries.select(
        F.col(id_col).cast("long").alias("qid"), _as_double(vec_col).alias("v")
    ).toPandas()
    q_ids = np.asarray(q_pdf["qid"], dtype=np.int64)
    Q = np.stack(q_pdf["v"].to_numpy()).astype(np.float64)
    q_norm = np.sqrt((Q * Q).sum(axis=1))
    q_scale = np.where(q_norm > 0, q_norm, 1.0)
    Qn = (Q / q_scale[:, None]) * (q_norm > 0)[:, None]
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((q_ids, Qn.T.copy()))
    eps = 10.0 ** (-round_dp)

    src = corpus.select(
        F.col(id_col).cast("long").alias("nbr_id"), _as_double(vec_col).alias("v")
    )

    def search(batches):
        ids, QnT = bq.value
        nq = len(ids)
        kk = min(k + 1, nq)  # +1: self-match removed after scoring
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            m_norm = np.sqrt((M * M).sum(axis=1))
            m_scale = np.where(m_norm > 0, m_norm, 1.0)
            Mn = (M / m_scale[:, None]) * (m_norm > 0)[:, None]
            S = Mn @ QnT  # (batch, nq)
            nbr = np.asarray(pdf["nbr_id"], dtype=np.int64)
            if len(nbr) > kk:
                kth = np.partition(S, -kk, axis=0)[-kk, :]  # per-query kth largest
                keep_r, keep_q = np.where(S >= (kth[None, :] - eps))
            else:
                keep_r, keep_q = np.where(np.ones_like(S, dtype=bool))
            out = pd.DataFrame(
                {
                    "query_id": ids[keep_q],
                    "nbr_id": nbr[keep_r],
                    "sim": S[keep_r, keep_q],
                }
            )
            yield out[out["query_id"] != out["nbr_id"]]

    import pyspark.sql.types as T

    scored = src.mapInPandas(
        search,
        schema=T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("nbr_id", T.LongType()),
                T.StructField("sim", T.DoubleType()),
            ]
        ),
    ).select("query_id", "nbr_id", F.round("sim", round_dp).alias("sim_r"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_r"), F.asc("nbr_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """All pairs (a_id < b_id) with cosine ≥ threshold → (a_id, b_id, sim_r).

    Exact (cross-join) — callers restrict the input to a bounded subset or
    use lsh_topk for web scale."""
    a = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("a_id"), F.col("_v").alias("av"), F.col("_norm").alias("an")
    )
    b = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("b_id"), F.col("_v").alias("bv"), F.col("_norm").alias("bn")
    )
    sim = _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(F.when((F.col("an") > 0) & (F.col("bn") > 0), sim).otherwise(F.lit(0.0)), round_dp).alias("sim_r"),
        )
        .filter(F.col("sim_r") >= threshold)
    )


def embed_records(
    records: DataFrame,
    tokens_col: str = "token_set",
    id_col: str = "conv_id",
    dim: int = 64,
) -> DataFrame:
    """Deterministic feature-hashed embedding of a token-set column →
    (id_col, embedding: array<double>, L2-normalized).

    The DeepBlocker analog (SURVEY J2) without a learned autoencoder: each
    token adds ±1 (sign from a second hash) to dimension hash(token) % dim
    — classic feature hashing / SimHash-style projection, entirely native
    Column expressions (explode → groupBy id,dim → pivot-free array
    assembly), deterministic and model-free. Cosine on these embeddings
    approximates token-set similarity, so the generic vector joins
    (:func:`lsh_topk`, :func:`brute_force_topk`, :func:`ivf_topk`) become
    blockers for any record corpus.
    """
    posts = records.select(
        F.col(id_col).alias("_id"), F.explode(tokens_col).alias("tok")
    )
    contrib = posts.select(
        "_id",
        F.pmod(F.hash("tok"), F.lit(dim)).alias("d"),
        (F.pmod(F.hash("tok", F.lit(1)), F.lit(2)) * 2 - 1).cast("double").alias("v"),
    )
    sparse = contrib.groupBy("_id", "d").agg(F.sum("v").alias("val"))
    vecs = sparse.groupBy("_id").agg(
        F.map_from_entries(F.collect_list(F.struct("d", "val"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)),
    )
    out = vecs.select(F.col("_id").alias(id_col), dense.alias("_raw"))
    norm = F.sqrt(
        F.aggregate(F.zip_with("_raw", "_raw", lambda a, b: a * b), F.lit(0.0), lambda x, v: x + v)
    )
    return out.select(
        id_col,
        F.when(
            norm > 0, F.transform("_raw", lambda x: x / norm)
        ).otherwise(F.col("_raw")).alias("embedding"),
    )


def vector_blocking(
    records_a: DataFrame,
    records_b: DataFrame,
    k: int = 5,
    tokens_col: str = "token_set",
    id_col: str = "conv_id",
    dim: int = 128,
    n_planes: int = 6,
    n_tables: int = 12,
) -> DataFrame:
    """J2 as a blocker: feature-hash both sides, hyperplane-LSH candidate
    join, exact cosine top-k → (a_id, b_id, sim) candidate pairs."""
    ea = embed_records(records_a, tokens_col, id_col, dim)
    eb = embed_records(records_b, tokens_col, id_col, dim)
    out = lsh_topk(
        ea, eb, k=k, id_col=id_col, vec_col="embedding",
        n_planes=n_planes, n_tables=n_tables,
    )
    return out.select(
        F.col("query_id").alias("a_id"), F.col("nbr_id").alias("b_id"),
        F.col("sim_r").alias("sim"),
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_dp: int = 4,
) -> DataFrame:
    """IVF-style ANN: KMeans-partition the corpus into ``n_lists`` cells,
    probe the ``n_probe`` nearest cells per query, exact cosine re-rank
    within the probed cells → (query_id, nbr_id, sim_r), approximate.

    The 100 TB shape: the corpus is clustered ONCE (Spark ML KMeans,
    data-parallel) and stored partitioned by cell; each query touches
    n_probe/n_lists of the data through an equi-join on cell id — no cross
    join, no full scan. Centroids are tiny and broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).cast("long").alias("nbr_id"), _as_double(vec_col).alias("cv")
    ).withColumn("_feat", array_to_vector("cv"))
    km = KMeans(k=n_lists, seed=seed, featuresCol="_feat", predictionCol="cell")
    model = km.fit(c)
    assigned = model.transform(c).select("nbr_id", "cv", "cell")

    centroids = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centroids, "cell int, centroid array<double>")

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "cdist",
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("qv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = (
        qc.withColumn("_pr", F.row_number().over(wprobe))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )

    cn = F.sqrt(F.aggregate(F.zip_with("cv", "cv", lambda a, b: a * b), F.lit(0.0), lambda x, v: x + v))
    cand = probes.join(assigned, "cell").filter(F.col("query_id") != F.col("nbr_id"))
    sim = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * cn)
    scored = cand.select(
        "query_id",
        "nbr_id",
        F.round(F.when(F.col("qn") > 0, sim).otherwise(F.lit(0.0)), round_dp).alias("sim_r"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_r"), F.asc("nbr_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def _hyperplane_sign(vec: Column, plane: int, seed: int) -> Column:
    """sign(v · h_plane) where h_plane[i] = deterministic pseudo-random ±/value
    from murmur3(i, plane, seed), scaled to [-1, 1]. Pure JVM expression."""
    weighted = F.zip_with(
        vec,
        F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda i: (F.hash(i, F.lit(plane), F.lit(seed)).cast("double") / F.lit(2147483647.0)),
        ),
        lambda x, h: x * h,
    )
    return (F.aggregate(weighted, F.lit(0.0), lambda a, v: a + v) > 0).cast("int")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    round_dp: int = 4,
) -> DataFrame:
    """Random-hyperplane LSH ANN → (query_id, nbr_id, sim_r), approximate.

    Bucket key per table = the n_planes sign bits; candidates = bucket
    collisions in any table (distinct), then exact cosine re-rank. At 100 TB
    the bucket join replaces the cross join: cost ∝ collisions, and AQE
    skew-join splits hot buckets.
    """
    def bucketed(df: DataFrame, side: str) -> DataFrame:
        v = _as_double(vec_col)
        out = df.select(F.col(id_col).alias(f"{side}_id"), v.alias("_v"))
        tables = []
        for t in range(n_tables):
            bits = [
                _hyperplane_sign(F.col("_v"), t * n_planes + p, seed) for p in range(n_planes)
            ]
            key = F.concat_ws("", *[b.cast("string") for b in bits])
            tables.append(
                out.select(
                    f"{side}_id", F.lit(t).alias("tbl"), key.alias("bucket")
                )
            )
        res = tables[0]
        for x in tables[1:]:
            res = res.unionByName(x)
        return res

    bq = bucketed(queries, "q")
    bc = bucketed(corpus, "c")
    cand = (
        bq.join(bc, ["tbl", "bucket"])
        .select(F.col("q_id").alias("query_id"), F.col("c_id").alias("nbr_id"))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .distinct()
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("qv"), F.col("_norm").alias("qn")
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("_v").alias("cv"), F.col("_norm").alias("cn")
    )
    sim = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        cand.join(q, "query_id")
        .join(c, "nbr_id")
        .select(
            "query_id",
            "nbr_id",
            F.round(F.when((F.col("qn") > 0) & (F.col("cn") > 0), sim).otherwise(F.lit(0.0)), round_dp).alias("sim_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_r"), F.asc("nbr_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
