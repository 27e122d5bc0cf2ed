"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      : brute-force exact top-k against one query vector,
                         entirely JVM-side (``zip_with``/``aggregate``
                         higher-order functions — no Python in the scan).
- ``cosine_topk_many`` : broadcast a small query-vector table, exact
                         top-k per query via window (the kNN pattern).
- ``ann_lsh_topk``     : random-hyperplane LSH buckets + multiprobe
                         re-rank — the 100 TB path: the big side is
                         scanned once, bucketed, and only candidate
                         buckets are re-ranked exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _dot_expr(a, b):
    # cast BEFORE multiply: float32 products differ from double products at
    # ~1e-7 relative, which breaks cross-engine (DuckDB oracle) rounding
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_expr(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int,
    order_round: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to one query vector (JVM-side).

    Distributed plan: ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — every partition keeps a local top-k heap and
    only k rows per partition reach the driver-side merge. (A global
    ``row_number`` window would funnel ALL rows through one task.)

    ``order_round`` (decimal places) makes the ordering key
    ``round(cosine, dp)`` so last-ulp float summation differences across
    engines cannot flip ranks — ties then break deterministically by id.
    """
    q = F.array(*[F.lit(float(v)) for v in query])
    q_norm = float(np.linalg.norm(np.asarray(query, dtype=np.float64)))
    cos = _dot_expr(F.col(vec_col), q) / (_norm_expr(F.col(vec_col)) * F.lit(q_norm))
    scored = df.select(F.col(id_col).alias("id"), cos.alias("cosine"))
    order_key = (
        F.round(F.col("cosine"), order_round) if order_round is not None
        else F.col("cosine")
    )
    return (
        scored.withColumn("_ord", order_key)
        .orderBy(F.col("_ord").desc(), F.col("id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("_ord").desc(), F.col("id"))
        ))
        .select("rank", "id", "cosine")
    )


def cosine_topk_many(
    df: DataFrame, vec_col: str, id_col: str, queries: DataFrame, k: int
) -> DataFrame:
    """Exact top-k per query row (queries: query_id, vec) — broadcast join."""
    pairs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).join(F.broadcast(queries.select("query_id", F.col("vec").alias("q_vec"))))
    cos = _dot_expr(F.col("vec"), F.col("q_vec")) / (
        _norm_expr(F.col("vec")) * _norm_expr(F.col("q_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int,
    dim: int,
    n_planes: int = 12,
    n_probes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket + multiprobe re-rank.

    Probes the query's bucket and the ``n_probes`` nearest buckets (by
    flipping the lowest-margin hyperplane bits), then re-ranks candidates
    exactly. Recall is tunable via n_planes/n_probes; the scan never
    computes full-corpus distances.
    """
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    @F.pandas_udf(LongType())
    def signature(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        bits = (m @ planes.T) > 0
        out = np.zeros(len(vecs), dtype=np.int64)
        for j in range(n_planes):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out)

    qv = np.asarray(query, dtype=np.float64)
    margins = planes @ qv
    q_sig = 0
    for j in range(n_planes):
        if margins[j] > 0:
            q_sig |= 1 << j
    # multiprobe: flip the bits with the smallest |margin|
    order = np.argsort(np.abs(margins))
    probe_sigs = {q_sig}
    for bit in order[: max(0, n_probes - 1)]:
        probe_sigs.add(q_sig ^ (1 << int(bit)))

    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        signature(F.col(vec_col)).alias("sig"),
    ).filter(F.col("sig").isin(list(probe_sigs)))

    q = F.array(*[F.lit(float(v)) for v in query])
    q_norm = float(np.linalg.norm(qv))
    cos = _dot_expr(F.col("vec"), q) / (_norm_expr(F.col("vec")) * F.lit(q_norm))
    return (
        bucketed.withColumn("cosine", cos)
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("cosine").desc(), F.col("id"))
        ))
        .select("rank", "id", "cosine")
    )
