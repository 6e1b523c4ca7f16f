"""Embedding similarity search over the `embeddings` table.

Brute-force cosine top-k is the correctness baseline (and the DuckDB-oracle
query); the LSH-bucketed variant is the 100 TB scale path: random
hyperplanes derived deterministically from md5 (no RNG), bucket self-join
instead of a cross join, then exact re-rank within buckets.

Cosine is computed JVM-side with zip_with + aggregate (no Python), cast to
double, and rounded to 9 decimals before ranking so the Spark and DuckDB
float paths order identically (ties broken by neighbor id).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    e = F.col(col).cast("array<double>")
    return df.withColumn("_e", e).withColumn("_norm", F.sqrt(_dot(F.col("_e"), F.col("_e"))))


def cosine_topk(emb: DataFrame, n_queries: int = 20, k: int = 3) -> DataFrame:
    """Exact top-k neighbors for vec_id < n_queries (self excluded).

    Output: (query_id, rank, neighbor_id, cos_x1e9).
    """
    base = with_norm(emb).select(F.col("vec_id"), "_e", "_norm")
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("_e").alias("_qe"),
        F.col("_norm").alias("_qnorm"))
    joined = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _dot(F.col("_e"), F.col("_qe")) / (F.col("_norm") * F.col("_qnorm")))
        .withColumn("cos_r", F.round(F.col("cos"), 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("rank").cast("long"),
            F.col("vec_id").cast("long").alias("neighbor_id"),
            F.floor(F.col("cos_r") * 1e9 + F.lit(0.5)).cast("long").alias("cos_x1e9"),
        )
    )


def cosine_dup_pairs(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Near-duplicate pairs by cosine (embedding near-dup detection).

    All-pairs is inherently O(n²); the executor-side work is a blocked
    matrix product in a mapInPandas UDF against a broadcast of the (small)
    full matrix — the classic broadcast-the-small-side pattern. The dot
    product accumulates dimension-by-dimension (sequential fold), so every
    double is bit-identical to the SQL `aggregate(zip_with(...))` fold the
    DuckDB oracle mirrors; rounding/threshold stay in Spark expressions.
    At 10^9-vector scale the broadcast no longer fits and lsh_bucket_topk's
    bucket join is the supported path.
    Output: (vec_a, vec_b, cos_x1e9), vec_a < vec_b.
    """
    import numpy as np

    spark = emb.sparkSession
    src = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    pdf = src.toPandas()
    ids_all = pdf["vec_id"].to_numpy(dtype=np.int64)
    M = np.stack(pdf["e"].to_numpy())  # (N, D) float64
    D = M.shape[1]

    def _fold_rows(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        # sequential per-dim accumulation == left-to-right double fold
        acc = np.zeros((A.shape[0], B.shape[0]))
        for d in range(D):
            acc += A[:, d:d + 1] * B[:, d][None, :]
        return acc

    def _fold_self(A: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(A.shape[0])
        for d in range(D):
            acc += A[:, d] * A[:, d]
        return acc

    norms_all = np.sqrt(_fold_self(M))
    bc = spark.sparkContext.broadcast((ids_all, M, norms_all))

    def gen(batches):
        import pandas as pd

        ids, Mb, norms = bc.value
        for batch in batches:
            if not len(batch):
                continue
            a_ids = batch["vec_id"].to_numpy(dtype=np.int64)
            A = np.stack(batch["e"].to_numpy())
            dot = _fold_rows(A, Mb)
            cos = dot / (np.sqrt(_fold_self(A))[:, None] * norms[None, :])
            ia, ib = np.nonzero((a_ids[:, None] < ids[None, :])
                                & (cos >= threshold - 1e-9))
            yield pd.DataFrame({
                "vec_a": a_ids[ia], "vec_b": ids[ib], "cos": cos[ia, ib]})

    pairs = src.repartition(emb.sparkSession.sparkContext.defaultParallelism) \
        .mapInPandas(gen, "vec_a long, vec_b long, cos double")
    return (
        pairs.withColumn("cos_r", F.round(F.col("cos"), 9))
        .filter(F.col("cos_r") >= threshold)
        .select("vec_a", "vec_b",
                F.floor(F.col("cos_r") * 1e9 + F.lit(0.5)).cast("long").alias("cos_x1e9"))
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 (no RNG state)."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()
            vals.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # ~U(-1, 1)
        planes.append(vals)
    return planes


def lsh_bucket_topk(emb: DataFrame, n_queries: int = 20, k: int = 3,
                    n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing + in-bucket exact re-rank.

    Approximate — recall < 1 vs cosine_topk by construction; the bucket key
    is a signature of sign(e·plane) bits, so the self-join shuffles on the
    bucket hash instead of broadcasting the full corpus.
    Output: (query_id, rank, neighbor_id, cos_x1e9) within shared buckets.
    """
    planes = _hyperplanes(dim, n_planes)
    base = with_norm(emb)
    sig = F.concat_ws(
        "",
        *[
            F.when(
                F.aggregate(
                    F.zip_with(F.col("_e"), F.array(*[F.lit(v) for v in plane]),
                               lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x,
                ) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for plane in planes
        ],
    )
    b = base.withColumn("bucket", sig).select("vec_id", "_e", "_norm", "bucket")
    q = b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("_e").alias("_qe"),
        F.col("_norm").alias("_qnorm"), "bucket")
    joined = (
        b.join(q, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_r", F.round(
            _dot(F.col("_e"), F.col("_qe")) / (F.col("_norm") * F.col("_qnorm")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("query_id").cast("long"), F.col("rank").cast("long"),
                F.col("vec_id").cast("long").alias("neighbor_id"),
                F.floor(F.col("cos_r") * 1e9 + F.lit(0.5)).cast("long").alias("cos_x1e9"))
    )
