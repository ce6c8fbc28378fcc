"""Similarity search over embedding columns (array<float>).

Graft additions for training-data pipelines (not in the reference):

* brute-force cosine top-k — the exact baseline, dot products computed
  JVM-side with higher-order functions (zip_with + aggregate), window
  top-k.  Right answer, O(Q*N) — fine when one side broadcasts.
* LSH-bucketed ANN — random-hyperplane signatures (deterministic seed)
  computed in a vectorized pandas UDF (one matmul per Arrow batch),
  candidates from multi-probe bucket equi-joins, exact re-rank.  The
  scale path: shuffles on compact bucket keys only.
* embedding-cosine near-duplicate pairs — same machinery, threshold form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a, b):
    """JVM-side dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_bruteforce(
    queries: DataFrame, candidates: DataFrame, k: int,
    query_id: str = "query_id", cand_id: str = "cand_id",
    q_vec: str = "embedding", c_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k; broadcasts the query side.
    Output: (query_id, rank, cand_id) ordered by (sim desc, cand_id)."""
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(q_vec).alias("_qv"))
    c = candidates.select(F.col(cand_id).alias("cand_id"),
                          F.col(c_vec).alias("_cv"))
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("cand_id"))
    sim = cosine_expr(F.col("_qv").cast("array<double>"),
                      F.col("_cv").cast("array<double>")).alias("sim")
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("cand_id").asc())
    return (
        joined.select("query_id", "cand_id", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (B, dim)
        bits = (mat @ planes.T) > 0       # (B, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return sig


def ann_lsh_topk(
    queries: DataFrame, candidates: DataFrame, k: int, dim: int,
    n_planes: int = 12, n_probes: int = 1,
    query_id: str = "query_id", cand_id: str = "cand_id",
    q_vec: str = "embedding", c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join + exact re-rank.

    ``n_probes`` > 1 additionally probes buckets at hamming distance 1
    (flip one bit), boosting recall at the cost of a wider candidate set.
    """
    sig = lsh_signature_udf(dim, n_planes)
    c = candidates.select(F.col(cand_id).alias("cand_id"),
                          F.col(c_vec).alias("_cv"),
                          sig(F.col(c_vec)).alias("_bucket"))
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(q_vec).alias("_qv"),
                       sig(F.col(q_vec)).alias("_sig"))
    if n_probes > 1:
        probes = F.array(
            F.col("_sig"),
            *[F.col("_sig").bitwiseXOR(F.lit(1 << b))
              for b in range(min(n_planes, n_probes - 1))],
        )
    else:
        probes = F.array(F.col("_sig"))
    q = q.select("query_id", "_qv",
                 F.explode(probes).alias("_bucket"))
    joined = q.join(c, on="_bucket", how="inner").filter(
        F.col("query_id") != F.col("cand_id"))
    sim = cosine_expr(F.col("_qv").cast("array<double>"),
                      F.col("_cv").cast("array<double>")).alias("sim")
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                               F.col("cand_id").asc())
    return (
        joined.select("query_id", "cand_id", sim)
        .dropDuplicates(["query_id", "cand_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "sim")
    )


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, n_planes: int = 10) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-blocked.
    Output: (id_a, id_b, sim)."""
    sig = lsh_signature_udf(dim, n_planes)
    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("_v"),
                     sig(F.col(vec_col)).alias("_bucket"))
    a, b = base.alias("a"), base.alias("b")
    sim = cosine_expr(F.col("a._v").cast("array<double>"),
                      F.col("b._v").cast("array<double>")).alias("sim")
    return (
        a.join(b, (F.col("a._bucket") == F.col("b._bucket"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"),
                sim)
        .filter(F.col("sim") >= threshold)
    )
