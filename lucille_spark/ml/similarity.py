"""Approximate-nearest-neighbor similarity search over embedding columns.

Baseline: brute-force cosine top-k, computed entirely JVM-side with
higher-order array functions (``zip_with`` products + sequential
``aggregate`` fold — deterministic summation order, reproducible in the
DuckDB oracle). Scale path: sign-random-projection LSH buckets (deterministic
hyperplanes from splitmix64) prune candidates before the exact rerank —
the bucket join is one shuffle instead of a full cross product.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(df: DataFrame, query_vec: Sequence[float], id_col: str,
                vec_col: str, k: int = 10,
                score_decimals: int = 4) -> DataFrame:
    """Brute-force cosine top-k: (vec_id, rank, cosine)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    dot = _dot(v, q)
    cos = dot / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))
    scored = df.select(F.col(id_col).alias("vec_id"), cos.alias("raw"))
    topk = scored.orderBy(F.col("raw").desc(), F.col("vec_id")).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("raw").desc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long")) \
               .select("vec_id", "rank",
                       F.round("raw", score_decimals).alias("cosine"))


def _splitmix64_py(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5)."""
    out = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            out[p, d] = _splitmix64_py(seed + p * 131071 + d) / 2.0**64 - 0.5
    return out


def srp_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-random-projection bucket id for a vector column."""
    v = _as_double(vec_col)
    bits = []
    for p in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        bits.append(F.when(_dot(v, plane) >= 0, F.lit(2 ** p)).otherwise(0))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def cosine_topk_lsh(df: DataFrame, query_vec: Sequence[float], id_col: str,
                    vec_col: str, k: int = 10, n_planes: int = 8,
                    seed: int = 7, score_decimals: int = 4) -> DataFrame:
    """LSH-bucketed ANN: prune to vectors whose SRP bucket is within
    Hamming distance 1 of the query's bucket, then exact cosine rerank.

    Approximate by construction (recall < 1 is possible) — pair it with
    cosine_topk as the ground-truth check. At 100 TB the bucket column is
    precomputed and the table is partitioned by it: the probe touches
    n_planes+1 partitions instead of the full corpus."""
    dim = len(query_vec)
    planes = hyperplanes(n_planes, dim, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = 0
    for p in range(n_planes):
        if float(np.dot(planes[p], qv)) >= 0:
            qbits += 1 << p
    probe = [qbits] + [qbits ^ (1 << p) for p in range(n_planes)]
    bucketed = df.withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
    cands = bucketed.filter(F.col("_bucket").isin(probe))
    return cosine_topk(cands, query_vec, id_col, vec_col, k, score_decimals)


def pairwise_cosine_block(df: DataFrame, id_col: str, vec_col: str,
                          block_col: str, threshold: float) -> DataFrame:
    """Embedding near-duplicate pairs within a blocking key:
    (id_a, id_b, cosine >= threshold)."""
    base = df.select(F.col(id_col).alias("vid"),
                     F.col(block_col).alias("block"),
                     _as_double(F.col(vec_col)).alias("v"))
    a, b = base.alias("a"), base.alias("b")
    pairs = (a.join(b, "block")
             .filter(F.col("a.vid") < F.col("b.vid")))
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(_dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(_dot(F.col("b.v"), F.col("b.v"))))
    return (pairs.select(F.col("a.vid").alias("id_a"),
                         F.col("b.vid").alias("id_b"),
                         cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))
