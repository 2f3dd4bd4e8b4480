"""Approximate nearest neighbor search over an embedding column.

Two paths (round brief: "brute-force cosine top-k as the baseline; an
IVF or LSH-bucketed variant as the scale path"):

* brute force — exact cosine via ``zip_with``/``aggregate`` (JVM) +
  window top-k; quadratic, the correctness oracle
  (``__spark_entry__.ann_cosine_topk``).
* IVF — k-means centroids trained driver-side on a deterministic
  SAMPLE (IVF training is sample-based at any scale), broadcast to
  executors; every vector is assigned to its nearest centroid bucket
  by an Arrow pandas UDF (one matmul per batch); queries probe the
  ``nprobe`` nearest buckets only, so the candidate set shrinks by
  ~n_buckets/nprobe. Bucket assignment is an equi-join key — the join
  shuffles on bucket id, AQE handles bucket skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (numpy)."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(centroids)):
            pts = sample[assign == j]
            if len(pts):
                centroids[j] = pts.mean(axis=0)
    return centroids


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_ivf_centroids(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    sample_limit: int = 10_000,
    seed: int = 7,
) -> np.ndarray:
    """Train centroids driver-side on a DETERMINISTIC sample: rows whose
    CRN hash of the stable id falls below the sampling fraction, sorted
    by id. A bare ``limit`` without ordering is partition-order
    dependent (changes under repartitioning/AQE) and would violate the
    CRN contract (crn.py:12-17). At 10^12 rows the hash filter is a
    single scan-side predicate — training cost is independent of table
    size once the fraction is sized to the table."""
    from pseudopeople_spark.crn import hash_u01

    n = vectors.count()
    if n > sample_limit:
        # oversample 1.5x by hash, then take the first `sample_limit` by id
        frac = min(1.0, 1.5 * sample_limit / n)
        sampled = vectors.where(hash_u01(F.col(id_col), seed, "ivf_train_sample") < frac)
    else:
        sampled = vectors
    pdf = sampled.select(id_col, vec_col).orderBy(id_col).limit(sample_limit).toPandas()
    if len(pdf) == 0:
        raise ValueError(
            "train_ivf_centroids: no vectors to train on (empty or fully-filtered input)"
        )
    m = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return _kmeans(_normalize(m), k, seed=seed)


def make_bucket_udf(centroids: np.ndarray, nprobe: int = 1):
    """Arrow UDF: nearest-``nprobe`` centroid ids per vector (one
    batch = one matmul; centroids live in the closure/broadcast)."""
    c = _normalize(np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(col: pd.Series) -> pd.Series:
        m = _normalize(np.array([np.asarray(v, dtype=np.float64) for v in col]))
        sims = m @ c.T  # cosine against all centroids
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return buckets


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_buckets: int = 16,
    nprobe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """IVF-bucketed cosine top-k: candidates restricted to the query's
    ``nprobe`` nearest buckets. Returns (qid, cid, sim, rn<=k)."""
    centroids = train_ivf_centroids(vectors, vec_col, id_col=id_col, k=n_buckets, seed=seed)
    assign1 = make_bucket_udf(centroids, nprobe=1)
    assignp = make_bucket_udf(centroids, nprobe=nprobe)

    cand = vectors.select(
        F.col(id_col).alias("cid"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("ce"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qe"),
        F.explode(assignp(F.col(vec_col))).alias("bucket"),
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))

    sim = F.round(dot(F.col("qe"), F.col("ce")) / (norm(F.col("qe")) * norm(F.col("ce"))), 4)
    scored = (
        q.join(cand, "bucket")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid", sim.alias("sim"))
        .dropDuplicates(["qid", "cid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")
