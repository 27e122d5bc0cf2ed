"""kNN spatial join: per-cell broadcast candidate lists + exact re-rank.

Two strategies, both exact on their supported paths (BASELINE.json
north_star: "kNN (per-cell broadcast candidate lists + exact re-rank)"):

- ``knn_broadcast``: the small query table is broadcast against the big
  point table (no shuffle of the big side), distances computed JVM-side,
  top-k per query via ``row_number`` window. Exact always. Scales in the
  big-table dimension (the 100 TB side streams through); the query side
  must fit in a broadcast (typical: 1e3-1e6 probe points).

- ``knn_cell_pruned``: points bucketed on a 2^bits mercator grid; each
  query probes its 3x3 cell neighborhood (candidate lists, x periodic
  across the antimeridian), exact re-rank within candidates, then an
  **exactness guarantee check**: the k-th neighbor distance must not
  exceed the distance to the unexplored region (one cell width minus
  in-cell offset, on the periodic cylinder). Queries failing the
  guarantee are re-run through the broadcast path (driver-side two-pass;
  at production density the fallback set is empty).

Distances are great-circle meters (haversine); ties broken by ascending
point id (FIXTURES.md §3 fixed rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8


def _local_topk(pairs: DataFrame, k_max: int, has_qk: bool) -> DataFrame:
    """Per-partition top-k reduction BEFORE any shuffle.

    ``pairs`` is the broadcast cartesian (big side never shuffled); a
    naive global window would exchange |points| x |queries| rows and
    funnel every candidate for a query into one task. This narrow
    ``mapInPandas`` pass keeps, per physical partition, only the k best
    (dist_m, point_id)-ordered rows per query — the shuffle that follows
    carries <= partitions x queries x k rows. Distributed top-k with a
    total order is a monoid, so local-then-global is exact.
    """
    cols = pairs.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields
    )

    def reduce_topk(batches):
        acc: pd.DataFrame | None = None
        for pdf in batches:
            cur = pd.concat([acc, pdf], ignore_index=True) if acc is not None else pdf
            cur = cur.sort_values(
                ["query_id", "dist_m", "point_id"], kind="mergesort",
                ignore_index=True,
            )
            rank = cur.groupby("query_id", sort=False).cumcount()
            keep = rank < (cur["q_k"] if has_qk else k_max)
            acc = cur[keep.to_numpy()]
        if acc is not None and len(acc):
            yield acc[cols]

    return pairs.mapInPandas(reduce_topk, schema=schema)


def haversine_m(lon1, lat1, lon2, lat2):
    """Column expression: great-circle distance in meters."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def knn_broadcast(
    points: DataFrame,
    queries: DataFrame,
    k: int | None = None,
    point_id: str = "image_id",
) -> DataFrame:
    """Exact kNN: broadcast queries x streaming points -> top-k per query.

    ``queries``: (query_id, lon, lat[, k]); per-row k overrides the global.
    Output: (query_id, rank, point_id, dist_m).
    """
    q = queries.select(
        F.col("query_id"),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
        *([F.col("k").alias("q_k")] if "k" in queries.columns else []),
    )
    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col("lon").alias("p_lon"),
        F.col("lat").alias("p_lat"),
    )
    pairs = p.join(F.broadcast(q))  # cartesian with broadcast: big side streams
    pairs = pairs.withColumn(
        "dist_m", haversine_m(F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat"))
    )
    has_qk = "k" in queries.columns
    # per-partition top-k first: the window below then fans in at most
    # partitions x k rows per query instead of |points| rows per query
    reduced = _local_topk(
        pairs.select("query_id", "point_id", "dist_m", *(["q_k"] if has_qk else [])),
        k_max=k or 10,
        has_qk=has_qk,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m"), F.col("point_id"))
    ranked = reduced.withColumn("rank", F.row_number().over(w))
    limit = F.col("q_k") if has_qk else F.lit(k or 10)
    return ranked.filter(F.col("rank") <= limit).select(
        "query_id", "rank", "point_id", "dist_m"
    )


def knn_cell_pruned(
    points: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 7,
    point_id: str = "image_id",
) -> tuple[DataFrame, DataFrame]:
    """Cell-pruned kNN with exactness guarantee.

    Returns (results, unguaranteed_query_ids). Callers re-run the second
    set through ``knn_broadcast`` (empty at production densities where
    every 3x3 neighborhood holds >= k points).
    """
    n = 1 << bits

    def cell_cols(lon, lat):
        mx = (lon + F.lit(180.0)) / F.lit(360.0)
        my = (
            F.lit(0.5)
            - F.log(F.tan(F.lit(np.pi / 4.0) + F.radians(lat) / F.lit(2.0)))
            / F.lit(2.0 * np.pi)
        )
        gx = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(mx * n))).cast("int")
        gy = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(my * n))).cast("int")
        return gx, gy, mx, my

    px, py, _, _ = cell_cols(F.col("lon"), F.col("lat"))
    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col("lon").alias("p_lon"),
        F.col("lat").alias("p_lat"),
        px.alias("gx"),
        py.alias("gy"),
    )

    qx, qy, qmx, qmy = cell_cols(F.col("lon"), F.col("lat"))
    q = queries.select(
        "query_id",
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
        qx.alias("qgx"),
        qy.alias("qgy"),
        qmx.alias("qmx"),
        qmy.alias("qmy"),
    )
    # explode the 3x3 neighborhood of each query -> candidate cell list.
    # x WRAPS at the antimeridian (the mercator cylinder is periodic in
    # lon): without the wrap, a query near lon=+-180 misses closer points
    # on the other side AND the edge-distance guarantee below is unsound
    # (mercator distance on the cut map overestimates ground distance for
    # paths crossing the seam). y never wraps (mercator clamps at the
    # poles). dropDuplicates guards tiny grids (n <= 3) where the wrap
    # aliases neighbor cells.
    offs = F.array([F.lit(d) for d in (-1, 0, 1)])
    qn = (
        q.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .withColumn("gx", ((F.col("qgx") + F.col("dx")) % n + n) % n)
        .withColumn("gy", F.col("qgy") + F.col("dy"))
        .drop("dx", "dy")
        .dropDuplicates(["query_id", "gx", "gy"])
    )
    cand = p.join(F.broadcast(qn), ["gx", "gy"])
    cand = cand.withColumn(
        "dist_m", haversine_m(F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m"), F.col("point_id"))
    ranked = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

    # guarantee: ground distance from the query to the unexplored region
    # must exceed the k-th neighbor distance. Mercator is conformal, so
    # ground length >= mercator length * min scale along the path; the
    # path stays inside the 3x3 block, so bound the scale by the block's
    # most poleward edge: scale(lat) = EQUATOR_M * cos(lat).
    guard_cells = (
        ranked.groupBy("query_id", "q_lat", "qmx", "qmy", "qgx", "qgy")
        .agg(F.max("dist_m").alias("kth"), F.count("*").alias("n_found"))
    )
    edge_cells = F.least(  # mercator distance to block edge, in cell units
        F.col("qmx") * n - F.col("qgx") + 1,
        F.col("qgx") + 2 - F.col("qmx") * n,
        F.col("qmy") * n - F.col("qgy") + 1,
        F.col("qgy") + 2 - F.col("qmy") * n,
    )

    def lat_of_my(my):  # inverse mercator
        return F.degrees(F.atan(F.sinh(F.lit(float(np.pi)) * (F.lit(1.0) - F.lit(2.0) * my))))

    lat_lo = lat_of_my((F.col("qgy").cast("double") - 1.0) / n)
    lat_hi = lat_of_my((F.col("qgy").cast("double") + 2.0) / n)
    worst_lat = F.greatest(F.abs(lat_lo), F.abs(lat_hi))
    equator_m = 40_075_016.686
    min_scale = F.lit(equator_m) * F.cos(F.radians(worst_lat))  # m per mercator unit
    bound_m = edge_cells / F.lit(float(n)) * min_scale
    guaranteed = guard_cells.withColumn(
        "ok", (F.col("n_found") >= k) & (F.col("kth") <= bound_m)
    )
    ok_ids = guaranteed.filter(F.col("ok")).select("query_id")
    # anti-join from the full query set: covers both failed-guarantee and
    # zero-candidate queries (empty 3x3 block)
    bad = queries.select("query_id").join(ok_ids, "query_id", "left_anti")
    good = ranked.join(ok_ids, "query_id", "left_semi").select(
        "query_id", "rank", "point_id", "dist_m"
    )
    return good, bad


def knn_exact(
    points: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 7,
    point_id: str = "image_id",
) -> DataFrame:
    """Exact kNN at scale: cell-pruned fast path + broadcast fallback for
    the (usually empty) set of queries whose guarantee failed."""
    good, bad = knn_cell_pruned(points, queries, k=k, bits=bits, point_id=point_id)
    fallback_qs = queries.join(bad, "query_id", "left_semi")
    fallback = knn_broadcast(points, fallback_qs.select("query_id", "lon", "lat"),
                             k=k, point_id=point_id)
    return good.unionAll(fallback)
