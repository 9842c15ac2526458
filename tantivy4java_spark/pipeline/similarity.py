"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: pure Catalyst (zip_with dot product + sort) —
  the exactness baseline and the oracle-checkable path.
- LSH-bucketed ANN: deterministic random-hyperplane signatures computed in an
  Arrow-batched pandas UDF (one matrix multiply per batch); candidates are
  restricted to the probe's bucket (multi-probe: flip bits) then re-ranked
  exactly.  The scale path: bucket key is the shuffle key, buckets are
  balanced by construction.
- IVF-style variant: coarse centroids via k-means|| (Spark MLlib-free, plain
  DataFrame Lloyd iterations), probe nearest `nprobe` centroids.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tantivy4java_spark.corpus import _splitmix64


def dot_expr(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a, b, na=None, nb=None):
    na = na if na is not None else norm_expr(a)
    nb = nb if nb is not None else norm_expr(b)
    return dot_expr(a, b) / (na * nb)


def brute_force_topk(df: DataFrame, vec_col: str, id_col: str,
                     query_vec: Sequence[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k against one query vector — the baseline.

    Catalyst plan: narrow map (dot/norm) -> TakeOrderedAndProject; no shuffle
    of the vectors, only the top-k merge.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.square(np.asarray(query_vec, dtype="float64")))))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = dot_expr(v, q) / (norm_expr(v) * F.lit(qn))
    return (df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col)).limit(k))


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-Gaussian hyperplanes from splitmix64 bits."""
    n = dim * nbits
    idx = np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u1 = _splitmix64(idx).astype(np.float64) / float(2**64)
    u2 = _splitmix64(idx + np.uint64(0x9E37)).astype(np.float64) / float(2**64)
    u1 = np.clip(u1, 1e-12, 1.0)
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)  # Box-Muller
    return g.reshape(nbits, dim)


def hyperplane_bucket_udf(dim: int, nbits: int = 8, seed: int = 42):
    """array<float> -> int bucket id via sign(H @ v); one matmul per batch."""
    H = _hyperplanes(dim, nbits, seed)
    weights = (1 << np.arange(nbits, dtype=np.int64))

    @F.pandas_udf(T.LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (M @ H.T) > 0
        return pd.Series((signs @ weights).astype(np.int64))

    return _bucket


def lsh_ann_topk(df: DataFrame, vec_col: str, id_col: str,
                 query_vec: Sequence[float], k: int = 10, nbits: int = 8,
                 multiprobe: int = 1, seed: int = 42) -> DataFrame:
    """ANN top-k: restrict to the query's LSH bucket (+ multiprobe bit flips),
    exact cosine re-rank inside.  At scale, write the table bucketed by _bkt
    so the probe prunes partitions instead of scanning."""
    q = np.asarray(query_vec, dtype=np.float64)
    H = _hyperplanes(len(q), nbits, seed)
    sig = ((H @ q) > 0)
    weights = (1 << np.arange(nbits, dtype=np.int64))
    base_bucket = int((sig @ weights))
    buckets = {base_bucket}
    for flips in range(multiprobe):
        for j in range(nbits):
            buckets.add(base_bucket ^ (1 << j))
    bucket = hyperplane_bucket_udf(len(q), nbits, seed)
    cand = (df.withColumn("_bkt", bucket(F.col(vec_col)))
            .filter(F.col("_bkt").isin(sorted(buckets))))
    return brute_force_topk(cand, vec_col, id_col, query_vec, k)


def knn_join(left: DataFrame, right: DataFrame, vec_col: str,
             left_id: str, right_id: str, k: int = 5) -> DataFrame:
    """Exact k-NN join (small right side): broadcast right, per-left top-k.

    For large-by-large, bucket both sides with hyperplane_bucket_udf and join
    on the bucket first.
    """
    from pyspark.sql.window import Window
    r = right.select(F.col(right_id).alias("_rid"),
                     F.col(vec_col).alias("_rv"))
    l = left.select(F.col(left_id).alias("_lid"),
                    F.col(vec_col).alias("_lv"))
    joined = l.join(F.broadcast(r))
    cos = cosine_expr(
        F.transform("_lv", lambda x: x.cast("double")),
        F.transform("_rv", lambda x: x.cast("double")))
    w = Window.partitionBy("_lid").orderBy(F.desc("cosine"), F.asc("_rid"))
    return (joined.withColumn("cosine", F.round(cos, 6))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id),
                    "cosine", F.col("_rn").cast("long").alias("rank")))


def knn_join_lsh(left: DataFrame, right: DataFrame, vec_col: str,
                 left_id: str, right_id: str, k: int = 5, nbits: int = 8,
                 multiprobe: int = 1, seed: int = 42) -> DataFrame:
    """Approximate LARGE-by-LARGE k-NN join — the scale path when neither
    side fits a broadcast.

    Both sides bucket with the same deterministic hyperplane LSH; each left
    row probes its own bucket plus every `multiprobe`-bit flip; candidates
    re-rank by exact cosine, per-left top-k.  The only shuffle key is the
    bucket id (uniform by construction) — never a cross join.  Recall grows
    with multiprobe; identical vectors are always recalled (same bucket).
    """
    from pyspark.sql.window import Window
    dim_row = left.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not dim_row:
        return knn_join(left, right, vec_col, left_id, right_id, k)
    dim = int(dim_row[0]["d"])
    bucket = hyperplane_bucket_udf(dim, nbits, seed)
    flips = [0]
    if multiprobe >= 1:
        flips += [1 << j for j in range(nbits)]
    l = (left.select(F.col(left_id).alias("_lid"),
                     F.col(vec_col).alias("_lv"))
         .withColumn("_b0", bucket(F.col("_lv")))
         .withColumn("_b", F.explode(F.array(
             *[F.col("_b0").bitwiseXOR(F.lit(f)) for f in flips])))
         .drop("_b0"))
    r = (right.select(F.col(right_id).alias("_rid"),
                      F.col(vec_col).alias("_rv"))
         .withColumn("_b", bucket(F.col("_rv"))))
    cand = (l.join(r, "_b")
            .dropDuplicates(["_lid", "_rid"]))
    cos = cosine_expr(
        F.transform("_lv", lambda x: x.cast("double")),
        F.transform("_rv", lambda x: x.cast("double")))
    w = Window.partitionBy("_lid").orderBy(F.desc("cosine"), F.asc("_rid"))
    return (cand.withColumn("cosine", F.round(cos, 6))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id),
                    "cosine", F.col("_rn").cast("long").alias("rank")))


def ivf_topk(spark: SparkSession, df: DataFrame, vec_col: str, id_col: str,
             query_vec: Sequence[float], k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, iters: int = 3, seed: int = 42) -> DataFrame:
    """IVF: Lloyd-iterated coarse centroids (DataFrame-only k-means),
    probe the nprobe nearest lists, exact re-rank inside."""
    dim_row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not dim_row:
        return brute_force_topk(df, vec_col, id_col, query_vec, k)
    # init centroids deterministically from hashed rows
    seed_rows = (df.select(vec_col)
                 .withColumn("_h", F.xxhash64(F.col(vec_col).cast("string")))
                 .orderBy("_h").limit(n_centroids).collect())
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows])

    def assign_udf(C: np.ndarray):
        @F.pandas_udf(T.IntegerType())
        def _assign(vecs: pd.Series) -> pd.Series:
            M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d2.argmin(axis=1).astype(np.int32))
        return _assign

    for _ in range(iters):
        assigned = df.withColumn("_c", assign_udf(cents)(F.col(vec_col)))
        agg = (assigned.groupBy("_c")
               .agg(*[F.avg(F.col(vec_col)[i]).alias(f"d{i}")
                      for i in range(cents.shape[1])])
               .collect())
        for row in agg:
            cents[int(row["_c"])] = np.array(
                [row[f"d{i}"] for i in range(cents.shape[1])])
    q = np.asarray(query_vec, dtype=np.float64)
    probe = np.argsort(((cents - q) ** 2).sum(axis=1))[:nprobe].tolist()
    cand = (df.withColumn("_c", assign_udf(cents)(F.col(vec_col)))
            .filter(F.col("_c").isin(probe)))
    return brute_force_topk(cand, vec_col, id_col, query_vec, k)
