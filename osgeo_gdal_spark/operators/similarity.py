"""Similarity search over embedding columns (array<float>).

- **brute-force cosine top-k**: the exact baseline. Dot products computed
  natively with ``F.zip_with`` + ``F.aggregate`` (fold over array elements
  — JVM-side, deterministic element order) against a broadcast query set;
  top-k via window rank. At 10^12 rows this is one map-only scan per query
  batch + a partial top-k (TakeOrdered) — no full shuffle.
- **LSH-bucketed ANN**: random-hyperplane signs (SimHash for vectors,
  Charikar) computed natively from a broadcast hyperplane matrix ->
  bucket equi-join -> exact re-rank inside candidate buckets. The scale
  path: candidates per query drop from N to N / 2^bits on average.

The kNN machinery mirrors the spatial ring-expansion operator — same
gather/refine shape, different key space.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot_expr(a: str, b: str) -> str:
    return (
        f"AGGREGATE(ZIP_WITH({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"SQRT({_dot_expr(a, a)})"


def cosine_topk(emb: DataFrame, queries: DataFrame, k=3,
                vec_col="embedding", id_col="vec_id") -> DataFrame:
    """Exact cosine top-k of each broadcast query vs all embeddings.

    queries: DataFrame (qid, qvec array<float>). Returns
    (qid, vec_id, cos_sim, rank); self-matches (qid == vec_id) excluded.
    """
    j = emb.crossJoin(F.broadcast(queries))
    scored = j.select(
        "qid",
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"{_dot_expr(vec_col, 'qvec')} / ({_norm_expr(vec_col)} * {_norm_expr('qvec')})"
        ).alias("cos_sim"),
    ).filter(F.col("qid") != F.col("vec_id"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplanes(dim: int, bits: int, seed=42) -> np.ndarray:
    """Deterministic random hyperplane matrix (bits x dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def with_lsh_bucket(emb: DataFrame, planes: np.ndarray,
                    vec_col="embedding") -> DataFrame:
    """Attach the sign-bucket id: bit b = (v . plane_b) >= 0 — computed
    natively per plane (the plane is a literal array; the fold is
    JVM-side)."""
    bits = planes.shape[0]
    bucket = None
    df = emb
    for b in range(bits):
        arr = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in planes[b])
        dot = _dot_expr(vec_col, f"ARRAY({arr})")
        bit = F.expr(f"CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END")
        bucket = bit if bucket is None else bucket * 2 + bit
    return df.withColumn("lsh_bucket", bucket.cast("long"))


def ann_topk_lsh(emb: DataFrame, queries: DataFrame, planes, k=3,
                 vec_col="embedding", id_col="vec_id") -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in ANY of L
    hash tables (multi-table LSH — the standard recall lever; one table's
    recall on near-orthogonal web embeddings is poor), then exact cosine
    re-rank. Recall < 1 by design; the scale path vs brute force.

    planes: one (bits x dim) matrix or a list of them (L tables).
    """
    tables = planes if isinstance(planes, (list, tuple)) else [planes]
    e = emb
    q = queries
    conds = []
    for t, pl in enumerate(tables):
        e = with_lsh_bucket(e, pl, vec_col).withColumnRenamed(
            "lsh_bucket", f"b{t}"
        )
        q = with_lsh_bucket(q, pl, "qvec").withColumnRenamed(
            "lsh_bucket", f"qb{t}"
        )
        conds.append(F.col(f"b{t}") == F.col(f"qb{t}"))
    any_match = conds[0]
    for c in conds[1:]:
        any_match = any_match | c
    cand = e.join(F.broadcast(q), any_match).filter(F.col("qid") != F.col(id_col))
    scored = cand.select(
        "qid",
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"{_dot_expr(vec_col, 'qvec')} / ({_norm_expr(vec_col)} * {_norm_expr('qvec')})"
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
