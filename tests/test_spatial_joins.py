"""PIP and kNN correctness vs brute-force numpy oracles (FIXTURES.md §2/§3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.io.synth import images_df, knn_queries_df, tile_boundaries_df
from cov_tiles_spark.pipeline.materialize import assign_tiles
from cov_tiles_spark.spatial.knn import knn_broadcast, knn_cell_pruned
from cov_tiles_spark.spatial.pip import pip_join, point_in_rings_np

N = 800


@pytest.fixture(scope="module")
def corpus(spark):
    return images_df(spark, N, partitions=4).cache()


def test_point_in_rings_kernel():
    # unit square with a center hole
    ring_lengths = np.array([4, 4])
    vb = np.array([0, 0, 10, 0, 10, 10, 0, 10,  4, 4, 6, 4, 6, 6, 4, 6])
    px = np.array([5.0, 1.0, 11.0, 4.5, -1.0])
    py = np.array([5.0, 1.0, 5.0, 4.5, 5.0])
    inside = point_in_rings_np(px, py, ring_lengths, vb)
    # center is in the hole; (1,1) inside; (11,5) outside; (4.5,4.5) in hole
    np.testing.assert_array_equal(inside, [False, True, False, False, False])


def test_pip_join(spark, corpus):
    assigned = assign_tiles(corpus.select("image_id", "lon", "lat"), [5]).cache()
    bounds = tile_boundaries_df(spark, assigned).cache()

    result = pip_join(
        assigned.select("image_id", "z", "x", "y", "local_x", "local_y"), bounds
    ).collect()
    assert len(result) == N
    bmap = {
        (r.z, r.x, r.y): r
        for r in bounds.select("z", "x", "y", "boundary", "is_hole_case").collect()
    }
    n_hole_excluded = 0
    for r in result:
        b = bmap[(r.z, r.x, r.y)]
        expected = point_in_rings_np(
            np.array([float(r.local_x)]),
            np.array([float(r.local_y)]),
            np.array(b.boundary.ring_offsets),
            np.array(b.boundary.vertex_buffer),
        )[0]
        assert r.inside == expected, (r.image_id, r.z, r.x, r.y)
        if b.is_hole_case and not r.inside:
            n_hole_excluded += 1
    # every point is inside its own tile square unless it fell in a hole
    outside = [r for r in result if not r.inside]
    assert all(bmap[(r.z, r.x, r.y)].is_hole_case for r in outside)


def _knn_oracle(p_lon, p_lat, p_ids, q_lon, q_lat, k):
    """Brute-force haversine kNN with (dist, id) tie-break."""
    R = 6_371_008.8
    lat1 = np.radians(p_lat)[None, :]
    lat2 = np.radians(q_lat)[:, None]
    dlat = lat1 - lat2
    dlon = np.radians(p_lon)[None, :] - np.radians(q_lon)[:, None]
    a = np.sin(dlat / 2) ** 2 + np.cos(lat2) * np.cos(lat1) * np.sin(dlon / 2) ** 2
    dist = 2 * R * np.arcsin(np.sqrt(a))
    out = []
    for qi in range(len(q_lon)):
        order = sorted(range(len(p_ids)), key=lambda j: (dist[qi, j], p_ids[j]))
        out.append([(p_ids[j], dist[qi, j]) for j in order[:k]])
    return out


def test_knn_broadcast_matches_oracle(spark, corpus):
    queries = knn_queries_df(spark, 40).cache()
    res = knn_broadcast(corpus, queries, k=None).collect()

    pts = corpus.select("image_id", "lon", "lat").collect()
    p_ids = [r.image_id for r in pts]
    p_lon = np.array([r.lon for r in pts])
    p_lat = np.array([r.lat for r in pts])
    qs = queries.collect()
    oracle = _knn_oracle(
        p_lon, p_lat, p_ids,
        np.array([q.lon for q in qs]), np.array([q.lat for q in qs]),
        k=9,
    )
    got: dict[str, list] = {}
    for r in res:
        got.setdefault(r.query_id, []).append((r.rank, r.point_id, r.dist_m))
    for qi, q in enumerate(qs):
        expect = oracle[qi][: q.k]
        mine = sorted(got[q.query_id])
        assert len(mine) == q.k, q.query_id
        for (rank, pid, dist), (opid, odist) in zip(mine, expect):
            assert pid == opid, (q.query_id, rank, pid, opid)
            assert abs(dist - odist) < 1e-6 * max(1.0, odist)


def test_knn_cell_pruned_exact_or_flagged(spark, corpus):
    queries = knn_queries_df(spark, 40).select("query_id", "lon", "lat").cache()
    k = 5
    good, bad = knn_cell_pruned(corpus, queries, k=k, bits=5)
    good_rows = good.collect()
    bad_ids = {r.query_id for r in bad.collect()}

    # every guaranteed query must match the exact broadcast result
    exact = {
        (r.query_id, r.rank): r.point_id
        for r in knn_broadcast(corpus, queries, k=k).collect()
    }
    assert good_rows, "cell-pruned kNN returned nothing"
    for r in good_rows:
        assert r.query_id not in bad_ids
        assert exact[(r.query_id, r.rank)] == r.point_id, (r.query_id, r.rank)
    # coverage: guaranteed + flagged == all queries
    covered = {r.query_id for r in good_rows} | bad_ids
    assert covered == {r.query_id for r in queries.collect()}


def test_knn_exact_wraps_antimeridian(spark):
    """Regression: a query near lon=+-180 must see closer points on the
    other side of the seam (3x3 cell neighborhood wraps in x), and the
    exactness guarantee must not falsely certify a seam-blind result."""
    from cov_tiles_spark.spatial.knn import knn_exact

    pts = [
        (1, 179.95, 10.0),    # 6 km east across the seam from the query
        (2, -179.0, 10.0),    # ~110 km east
        (3, -170.0, 10.0),    # far
        (4, 179.0, 10.0),     # ~116 km west (other side)
        (5, 170.0, 10.0),     # far
    ]
    points = spark.createDataFrame(pts, "image_id long, lon double, lat double")
    queries = spark.createDataFrame(
        [(0, -179.99, 10.0)], "query_id long, lon double, lat double"
    )
    res = knn_exact(points, queries, k=3, bits=5).collect()
    got = [r.point_id for r in sorted(res, key=lambda r: r.rank)]
    assert got == [1, 2, 4], got


def test_pip_join_broadcast_matches_cogroup(spark, corpus):
    from cov_tiles_spark.spatial.pip import pip_join_broadcast

    assigned = assign_tiles(corpus.select("image_id", "lon", "lat"), [5])
    bounds = tile_boundaries_df(spark, assigned)
    pts = assigned.select("image_id", "z", "x", "y", "local_x", "local_y")

    a = {(r.image_id, r.z): r.inside for r in pip_join(pts, bounds).collect()}
    b = {(r.image_id, r.z): r.inside for r in pip_join_broadcast(pts, bounds).collect()}
    assert a == b and len(a) == N
