"""Feature-order optimization for compression — the reference's own
"next steps" (`README.md:210-221`): order LineString features by
minimal inter-feature distance so successive delta chains stay short,
and Hilbert-order point features (the older converter did exactly this,
`MvtConverter.java:685-703`).

Feature order inside a tile layer is semantically free — the reference
itself re-orders (id sort, `CovtConverter.java:556-558`; point Hilbert
sort as above) and its conformance spec re-sorts before comparing
(`covtDecoder.spec.ts:105-108`) — so the encoder may pick whichever
order minimizes encoded bytes. Round-trip verification for reordered
tiles therefore compares feature *multisets* (see
``pipeline/transcode._features_match(any_order=True)``).

All kernels are vectorized numpy over the geometry struct-of-arrays;
the greedy LineString chain is the one O(n^2) piece and falls back to
an O(n log n) Hilbert-of-start sort above ``_GREEDY_CAP`` features.
"""

from __future__ import annotations

import numpy as np

from cov_tiles_spark.covt.decoder import GeometryColumn, _grouped_arange
from cov_tiles_spark.covt.metadata import GeometryType
from cov_tiles_spark.covt.sfc import hilbert_encode

_GREEDY_CAP = 8000


def feature_spans(geom: GeometryColumn) -> dict[str, np.ndarray]:
    """Per-feature consumption counts + exclusive starts for every
    geometry stream (same walk as ``decoder.vertex_segment_lengths``,
    aggregated to feature granularity)."""
    t = np.asarray(geom.geometry_types, dtype=np.int64)
    n = len(t)
    go = (
        np.zeros(0, np.int64)
        if geom.geometry_offsets is None
        else np.asarray(geom.geometry_offsets, np.int64)
    )
    po = (
        np.zeros(0, np.int64)
        if geom.part_offsets is None
        else np.asarray(geom.part_offsets, np.int64)
    )
    ro = (
        np.zeros(0, np.int64)
        if geom.ring_offsets is None
        else np.asarray(geom.ring_offsets, np.int64)
    )

    is_pt = t == GeometryType.POINT
    is_ls = t == GeometryType.LINESTRING
    is_poly = t == GeometryType.POLYGON
    is_mpt = t == GeometryType.MULTI_POINT
    is_mls = t == GeometryType.MULTI_LINESTRING
    is_mpoly = t == GeometryType.MULTI_POLYGON
    multi = is_mpt | is_mls | is_mpoly

    g_cnt = multi.astype(np.int64)
    g_start = np.cumsum(g_cnt) - g_cnt
    g_vals = np.zeros(n, np.int64)
    g_vals[multi] = go[: int(multi.sum())]

    parts_per = np.zeros(n, np.int64)
    parts_per[is_ls | is_poly] = 1
    parts_per[is_mls | is_mpoly] = g_vals[is_mls | is_mpoly]
    part_start = np.cumsum(parts_per) - parts_per

    pcum = np.concatenate([[0], np.cumsum(po)])
    poly_kind = is_poly | is_mpoly
    rings_per = np.zeros(n, np.int64)
    rings_per[poly_kind] = (
        pcum[part_start[poly_kind] + parts_per[poly_kind]]
        - pcum[part_start[poly_kind]]
    )
    ring_start = np.cumsum(rings_per) - rings_per
    rcum = np.concatenate([[0], np.cumsum(ro)])

    verts_per = np.zeros(n, np.int64)
    verts_per[is_pt] = 1
    verts_per[is_mpt] = g_vals[is_mpt]
    line_kind = is_ls | is_mls
    verts_per[line_kind] = (
        pcum[part_start[line_kind] + parts_per[line_kind]]
        - pcum[part_start[line_kind]]
    )
    verts_per[poly_kind] = (
        rcum[ring_start[poly_kind] + rings_per[poly_kind]]
        - rcum[ring_start[poly_kind]]
    )
    vert_start = np.cumsum(verts_per) - verts_per
    return {
        "g_cnt": g_cnt, "g_start": g_start,
        "parts_per": parts_per, "part_start": part_start,
        "rings_per": rings_per, "ring_start": ring_start,
        "verts_per": verts_per, "vert_start": vert_start,
    }


def _gather_blocks(
    vals: np.ndarray, starts: np.ndarray, counts: np.ndarray, perm: np.ndarray
) -> np.ndarray:
    cnt = counts[perm]
    if cnt.sum() == 0:
        return vals[:0]
    idx = np.repeat(starts[perm], cnt) + _grouped_arange(cnt)
    return vals[idx]


def permute_geometry(geom: GeometryColumn, perm: np.ndarray) -> GeometryColumn:
    """Reorder features in the geometry SoA (offsets stay counts)."""
    sp = feature_spans(geom)
    vb = np.asarray(geom.vertex_buffer)

    def opt(vals, start_key, cnt_key):
        if vals is None or len(vals) == 0:
            return vals
        out = _gather_blocks(
            np.asarray(vals), sp[start_key], sp[cnt_key], perm
        )
        return out

    return GeometryColumn(
        geometry_types=np.asarray(geom.geometry_types)[perm],
        vertex_buffer=_gather_blocks(
            vb, sp["vert_start"] * 2, sp["verts_per"] * 2, perm
        ),
        geometry_offsets=opt(geom.geometry_offsets, "g_start", "g_cnt"),
        part_offsets=opt(geom.part_offsets, "part_start", "parts_per"),
        ring_offsets=opt(geom.ring_offsets, "ring_start", "rings_per"),
    )


def _permute_prop(prop, perm: np.ndarray, n: int):
    """Reorder one PropertyInput (dense or sparse-over-present)."""
    from cov_tiles_spark.covt.encoder import PropertyInput

    vals = np.asarray(prop.values)
    if prop.present is None:
        return PropertyInput(prop.data_type, vals[perm], None)
    present = prop.present.astype(bool)
    new_present = present[perm]
    if len(vals) == n and int(present.sum()) != n:
        # dense values (boolean columns): plain gather
        return PropertyInput(prop.data_type, vals[perm], new_present)
    dense = np.empty(n, dtype=object)
    dense[present] = vals
    new_sparse = dense[perm][new_present]
    if vals.dtype != object:
        new_sparse = new_sparse.astype(vals.dtype)
    return PropertyInput(prop.data_type, new_sparse, new_present)


def permute_layer(layer, perm: np.ndarray):
    """Reorder a whole LayerInput (geometry + ids + properties +
    localized groups) by ``perm``."""
    from cov_tiles_spark.covt.encoder import LayerInput

    n = len(layer.geometry.geometry_types)
    perm = np.asarray(perm, dtype=np.int64)
    return LayerInput(
        name=layer.name,
        geometry=permute_geometry(layer.geometry, perm),
        ids=None if layer.ids is None else np.asarray(layer.ids)[perm],
        properties=(
            {k: _permute_prop(p, perm, n) for k, p in layer.properties.items()}
            if layer.properties
            else layer.properties
        ),
        localized=(
            {
                base: {k: _permute_prop(p, perm, n) for k, p in grp.items()}
                for base, grp in layer.localized.items()
            }
            if layer.localized
            else layer.localized
        ),
        extent=layer.extent,
    )


def _hilbert_key(x: np.ndarray, y: np.ndarray, extent: int) -> np.ndarray:
    half = extent // 2
    bits = (13 if extent == 4096 else 14) + 1
    lim = extent * 2 - half - 1
    return hilbert_encode(
        np.clip(x, -half, lim), np.clip(y, -half, lim), extent * 2, bits
    )


def candidate_perms(layer) -> list[tuple[str, np.ndarray]]:
    """All ordering candidates for a layer: the geometry-driven
    permutation of :func:`order_perm` plus the reference's id sort
    (`CovtConverter.java:556-558` sorts features ascending by id before
    encoding). Callers argmin over {identity} + these by encoded size —
    measured on the reference's own golden tiles, the source order
    usually wins (ids and properties arrive pre-sorted; see
    BENCH/BASELINE.md "feature-order levers"), so ordering is an
    *argmin candidate*, never an unconditional rewrite."""
    out: list[tuple[str, np.ndarray]] = []
    n = len(layer.geometry.geometry_types)
    perm = order_perm(layer.geometry, layer.extent)
    if perm is not None:
        out.append(("sfc", perm))
    if layer.ids is not None and n > 2:
        idp = np.argsort(np.asarray(layer.ids), kind="stable")
        if not bool((idp == np.arange(n)).all()):
            out.append(("idsort", idp))
    return out


def order_perm(geom: GeometryColumn, extent: int) -> np.ndarray | None:
    """Compression-friendly feature permutation, or None when the layer
    has no applicable strategy (mixed/polygon layers keep source order).

    - all-POINT layers: Hilbert sort of the single vertex;
    - all-LINESTRING/MULTI_LINESTRING layers: greedy minimal-distance
      chain — start at the Hilbert-smallest start vertex, then always
      jump to the unvisited feature whose start is nearest the current
      feature's end (README.md:210-221 "minimal distance to the
      previous"); above ``_GREEDY_CAP`` features, Hilbert-of-start.
    """
    t = np.asarray(geom.geometry_types, dtype=np.int64)
    n = len(t)
    if n < 3:
        return None
    vb = np.asarray(geom.vertex_buffer, dtype=np.int64)
    if bool((t == GeometryType.POINT).all()):
        key = _hilbert_key(vb[0::2], vb[1::2], extent)
        perm = np.argsort(key, kind="stable")
        return None if (perm == np.arange(n)).all() else perm
    line_kind = (t == GeometryType.LINESTRING) | (t == GeometryType.MULTI_LINESTRING)
    if bool(line_kind.all()):
        sp = feature_spans(geom)
        vs, vp = sp["vert_start"], sp["verts_per"]
        sx, sy = vb[vs * 2], vb[vs * 2 + 1]
        ex, ey = vb[(vs + vp) * 2 - 2], vb[(vs + vp) * 2 - 1]
        if n > _GREEDY_CAP:
            perm = np.argsort(_hilbert_key(sx, sy, extent), kind="stable")
            return None if (perm == np.arange(n)).all() else perm
        perm = np.empty(n, dtype=np.int64)
        alive = np.ones(n, dtype=bool)
        cur = int(np.argmin(_hilbert_key(sx, sy, extent)))
        for i in range(n):
            perm[i] = cur
            alive[cur] = False
            if i == n - 1:
                break
            d = (sx - ex[cur]) ** 2 + (sy - ey[cur]) ** 2
            d[~alive] = np.iinfo(np.int64).max
            cur = int(np.argmin(d))
        return None if (perm == np.arange(n)).all() else perm
    return None
