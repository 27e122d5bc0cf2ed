"""Semantic deduplication (SemDeDup-style): k-means cluster, then prune
cosine-near-duplicates within each cluster.

The cluster-based member of the dedup family (exact hash / MinHash /
SimHash / n-gram Jaccard / hyperplane-LSH live in ``operators/dedup.py``):
instead of hashing for candidate buckets, a spherical k-means partition
restricts the O(n²) cosine comparison to within-cluster pairs — the
public SemDeDup recipe (Abbas et al., 2023). At 100 TB the knobs are
``n_centroids`` (SemDeDup uses k in the tens of thousands, so cluster
size ~ corpus/k stays bounded AND k bounds the parallelism of the prune
stage) and ``max_cluster_size`` (degenerate clusters are dropped with a
logged count rather than detonating a worker — same contract as
``dedup._cap_buckets``).

Keep rule (deterministic, one pass): a vector is DROPPED iff some
lower-id vector in the same cluster has cosine >= threshold with it.
Comparing against all earlier ids (kept or not) keeps the rule
order-independent and fully vectorizable; it is at most as aggressive as
transitive-closure dedup and never drops a cluster's lowest-id member.

Training is a driver-side fit on the first ``sample_n`` rows by id
(tiny: k x dim floats out). That id-ordered sample is what makes the
DuckDB/numpy oracle twin reproducible; for a 100 TB corpus swap in
``similarity.train_sample_rows`` (map-only portable-hash sample) — the
operator takes pre-trained ``centroids`` for exactly that.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cov_tiles_spark.operators.similarity import ivf_assign

log = logging.getLogger(__name__)


def spherical_kmeans(m: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (same recipe as
    ``similarity.ivf_train_centroids``: farthest-point init from row 0,
    Lloyd with empty clusters keeping their previous centroid), over an
    already-materialized sample matrix. Returns unit-norm (k, dim)."""
    norms = np.linalg.norm(m, axis=1)
    m = m[norms > 0] / norms[norms > 0, None]
    chosen = [0]
    best_sim = m @ m[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, m @ m[nxt])
    centroids = m[chosen].copy()
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def _prune_cluster(pdf: pd.DataFrame, threshold: float, block: int = 4096) -> pd.DataFrame:
    """Within one cluster: drop rows with an earlier near-duplicate.

    Rows are processed in id order; cosine against ALL earlier rows in
    row blocks (memory O(block x cluster), flops O(c² d) — bounded by
    ``max_cluster_size`` upstream)."""
    pdf = pdf.sort_values("id").reset_index(drop=True)
    m = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    m = m / norms[:, None]
    n = len(pdf)
    kept = np.ones(n, dtype=bool)
    for s in range(0, n, block):
        e = min(s + block, n)
        sims = m[s:e] @ m[:e].T  # rows s..e vs every earlier row
        earlier = np.arange(s, e)[:, None] > np.arange(e)[None, :]
        kept[s:e] = ~((sims >= threshold) & earlier).any(axis=1)
    return pd.DataFrame(
        {"id": pdf["id"], "list_id": pdf["list_id"], "is_kept": kept}
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    n_centroids: int = 8,
    threshold: float = 0.95,
    iters: int = 10,
    sample_n: int = 200_000,
    centroids: np.ndarray | None = None,
    max_cluster_size: int | None = 500_000,
) -> DataFrame:
    """Per-row semantic-dedup verdict: (id, list_id, is_kept).

    Plan shape: one driver-side training collect (or none, with
    ``centroids``), one map-only assign (broadcast centroid matrix,
    vectorized pandas UDF), ONE shuffle on ``list_id`` into the
    per-cluster prune. No pairwise fan-out crosses the exchange — each
    vector ships once."""
    if centroids is None:
        rows = (
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
            .orderBy("id")
            .limit(sample_n)
            .collect()
        )
        m = np.stack([np.asarray(r.vec, dtype=np.float64) for r in rows])
        centroids = spherical_kmeans(m, n_centroids, iters)
    assigned = ivf_assign(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec",
        centroids,
    )
    if max_cluster_size is not None:
        sizes = assigned.groupBy("list_id").count()
        big = sizes.filter(F.col("count") > max_cluster_size).collect()
        if big:
            log.warning(
                "semantic_dedup: dropping %d cluster(s) over max_cluster_size=%d: %s",
                len(big), max_cluster_size,
                [(r.list_id, r["count"]) for r in big],
            )
            keep_ids = [r.list_id for r in sizes.collect()
                        if r["count"] <= max_cluster_size]
            assigned = assigned.filter(F.col("list_id").isin(keep_ids))
    thr = float(threshold)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        return _prune_cluster(pdf, thr)

    return assigned.groupBy("list_id").applyInPandas(
        prune, schema="id long, list_id int, is_kept boolean"
    )
