"""Distributed MVT → COVT tile transcoding — the reference's main program
(`CovtConverterTest.runOmtTest` / `BingCovtDemo`, SURVEY.md §3.1/§3.3)
re-expressed as a Spark job:

    spark.read.format("binaryFile").load("*.mvt")      # S2 scan
      -> mapInPandas(decode MVT, shred, encode COVT)   # §3.1 steps 1-2
      -> (path, z, x, y, covt payload, sizes, verified)

Each input tile is independent, so the job is embarrassingly parallel;
``binaryFile`` gives Catalyst-managed file splitting and predicate
pushdown on (path, length). Per-tile verification (decode our COVT and
compare feature-for-feature with the MVT decode — the reference's
round-trip oracle, `BingCovtDemo.java:194-222`) runs inline and is
reported as a boolean column, so a 100 TB transcode is self-auditing.
"""

from __future__ import annotations

import gzip as _gzip
import os
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cov_tiles_spark.covt.decoder import GeometryColumn, decode_covt
from cov_tiles_spark.covt.encoder import LayerInput, PropertyInput, encode_tile
from cov_tiles_spark.covt.metadata import ColumnDataType, GeometryType
from cov_tiles_spark.covt.mvt import MvtLayer, decode_mvt, encode_mvt

TRANSCODE_SCHEMA = (
    "path string, z int, x int, y int, mvt_bytes long, covt_bytes long, "
    "genb_bytes long, gzip_mvt_bytes long, gzip_covt_bytes long, "
    "n_layers int, n_features long, verified boolean, "
    "genb_verified boolean, payload binary"
)

_ZXY_RE = re.compile(r"(\d+)[_\-/](\d+)[_\-/](\d+)\.(mvt|pbf)$")


def _geometry_from_mvt(features) -> GeometryColumn:
    """Shred MVT feature geometries into the COVT SoA model (P2)."""
    types = []
    geometry_offsets = []
    part_offsets = []
    ring_offsets = []
    verts: list[np.ndarray] = []
    for f in features:
        parts = f.geometry
        if f.geom_type == 1:  # point(s)
            if len(parts) == 1 and len(parts[0]) == 1:
                types.append(GeometryType.POINT)
                verts.append(np.asarray(parts[0], dtype=np.int64))
            else:  # multipoint: one 1-pt line per point (loadGeometry form)
                types.append(GeometryType.MULTI_POINT)
                geometry_offsets.append(sum(len(p) for p in parts))
                for p in parts:
                    verts.append(np.asarray(p, dtype=np.int64))
        elif f.geom_type == 2:
            if len(parts) == 1:
                types.append(GeometryType.LINESTRING)
                part_offsets.append(len(parts[0]))
                verts.append(np.asarray(parts[0], dtype=np.int64))
            else:
                types.append(GeometryType.MULTI_LINESTRING)
                geometry_offsets.append(len(parts))
                for p in parts:
                    part_offsets.append(len(p))
                    verts.append(np.asarray(p, dtype=np.int64))
        else:  # polygon: rings arrive closed; store open (reference rule)
            open_rings = [p[:-1] if len(p) > 1 and p[0] == p[-1] else p for p in parts]
            types.append(GeometryType.POLYGON)
            part_offsets.append(len(open_rings))
            for r in open_rings:
                ring_offsets.append(len(r))
                verts.append(np.asarray(r, dtype=np.int64))
    vb = (
        np.concatenate(verts).astype(np.int32).ravel()
        if verts
        else np.empty(0, np.int32)
    )
    return GeometryColumn(
        geometry_types=np.asarray(types, np.uint8),
        vertex_buffer=vb,
        geometry_offsets=np.asarray(geometry_offsets, np.int64) if geometry_offsets else None,
        part_offsets=np.asarray(part_offsets, np.int64) if part_offsets else None,
        ring_offsets=np.asarray(ring_offsets, np.int64) if ring_offsets else None,
    )


def _properties_from_mvt(
    features,
) -> tuple[dict[str, PropertyInput], dict[str, dict[str, PropertyInput]]]:
    """Dynamic schema inference from property maps, typed from the first
    seen value (CovtConverter.java:485-547). String keys of the form
    ``base:locale`` are grouped with their base into a localized-
    dictionary column (README.md:153-157) — returns (plain, localized)."""
    n = len(features)
    keys: dict[str, type] = {}
    for f in features:
        for k, v in f.properties.items():
            if k not in keys and v is not None:
                keys[k] = type(v)

    # localized groups: every ':'-suffixed string key whose base exists
    # as a string key (or has >= 2 locales) shares one dictionary
    loc_bases: dict[str, list[str]] = {}
    for k, t in keys.items():
        if ":" in k and t is str:
            loc_bases.setdefault(k.split(":", 1)[0], []).append(k)
    localized_names: set[str] = set()
    localized: dict[str, dict[str, PropertyInput]] = {}
    for base, members in loc_bases.items():
        group_keys = list(members)
        if base in keys and keys[base] is str:
            group_keys.insert(0, base)
        if len(group_keys) < 2:
            continue
        localized[base] = {}
        localized_names.update(group_keys)
        for k in group_keys:
            present = np.zeros(n, dtype=bool)
            vals = []
            for i, f in enumerate(features):
                v = f.properties.get(k)
                if v is None:
                    continue
                present[i] = True
                vals.append(str(v))
            localized[base][k] = PropertyInput(
                ColumnDataType.STRING, np.asarray(vals, object), present
            )

    props: dict[str, PropertyInput] = {}
    for k, t in keys.items():
        if k in localized_names:
            continue
        present = np.zeros(n, dtype=bool)
        vals = []
        for i, f in enumerate(features):
            v = f.properties.get(k)
            if v is None:
                continue
            present[i] = True
            vals.append(v)
        if t is bool:
            dense = np.zeros(n, dtype=bool)
            dense[present] = np.asarray(vals, dtype=bool)
            props[k] = PropertyInput(ColumnDataType.BOOLEAN, dense, present)
        elif t is int:
            props[k] = PropertyInput(
                ColumnDataType.INT_64, np.asarray(vals, dtype=np.int64), present
            )
        elif t is float:
            props[k] = PropertyInput(
                ColumnDataType.FLOAT, np.asarray(vals, dtype=np.float32), present
            )
        else:
            props[k] = PropertyInput(
                ColumnDataType.STRING, np.asarray([str(v) for v in vals], object), present
            )
    return props, localized


def mvt_to_covt(mvt_bytes: bytes, allow_ice: bool = True) -> tuple[bytes, int, int]:
    """One tile: MVT bytes -> (COVT bytes, n_layers, n_features)."""
    layers = decode_mvt(mvt_bytes)
    inputs = []
    n_features = 0
    for lay in layers:
        if not lay.features:
            continue
        ids = (
            np.asarray([f.id for f in lay.features], dtype=np.int64)
            if all(f.id is not None for f in lay.features)
            else None
        )
        props, localized = _properties_from_mvt(lay.features)
        inputs.append(
            LayerInput(
                name=lay.name,
                geometry=_geometry_from_mvt(lay.features),
                ids=ids,
                properties=props,
                localized=localized or None,
                extent=lay.extent,
            )
        )
        n_features += len(lay.features)
    return encode_tile(inputs, allow_ice=allow_ice), len(inputs), n_features


def _genb_inputs(mvt_bytes: bytes) -> tuple[list[LayerInput], int]:
    """MVT bytes -> (LayerInput list, n_features) for gen-B encoding."""
    layers = decode_mvt(mvt_bytes)
    inputs = []
    n_features = 0
    for lay in layers:
        if not lay.features:
            continue
        ids = (
            np.asarray([f.id for f in lay.features], dtype=np.int64)
            if all(f.id is not None for f in lay.features)
            else None
        )
        props, localized = _properties_from_mvt(lay.features)
        inputs.append(
            LayerInput(
                name=lay.name,
                geometry=_geometry_from_mvt(lay.features),
                ids=ids,
                properties=props,
                localized=localized or None,
                extent=lay.extent,
            )
        )
        n_features += len(lay.features)
    return inputs, n_features


def mvt_to_genb(
    mvt_bytes: bytes, reorder: bool = False, allow_tae: bool = False,
    pfor_wire: str = "ours",
) -> tuple[bytes, dict, int, int]:
    """One tile: MVT bytes -> (gen-B COVT bytes, TileJSON dict, n_layers,
    n_features). ``name:*`` groups use the format-reserved
    LOCALIZED_DICTIONARY column type (shared dictionary across locales —
    our documented extension; the reference converter throws on it,
    CovtConverter.java:358-360).

    ``reorder=True`` additionally argmins each layer's feature order
    over {source, SFC/greedy-chain, id-sort} by encoded size
    (README.md:210-221 levers + the converter's id sort) — never worse
    than source order, ~3x encode cost, so it is the offline/parity
    option, not the hot default. Reordered tiles verify as feature
    multisets (``_features_match(any_order=True)``).

    ``allow_tae=True`` additionally lets the geometry argmin pick the
    TAE arc column (our documented extension beyond the reference's
    ColumnType enum — decode requires this library); TAE decode is
    vertex-for-vertex exact, so strict verification still applies."""
    from cov_tiles_spark.covt.genb import encode_tile_genb

    inputs, n_features = _genb_inputs(mvt_bytes)
    if reorder:
        from cov_tiles_spark.covt.order import candidate_perms, permute_layer

        def _sz(lay) -> int:
            return len(
                encode_tile_genb(
                    [lay], optimize_metadata=True, geometry_encoding="best",
                    allow_tae=allow_tae, pfor_wire=pfor_wire,
                )[0]
            )

        inputs = [
            min(
                [lay] + [permute_layer(lay, p) for _, p in candidate_perms(lay)],
                key=_sz,
            )
            for lay in inputs
        ]
    payload, tilejson = encode_tile_genb(
        inputs, optimize_metadata=True, geometry_encoding="best",
        allow_tae=allow_tae, pfor_wire=pfor_wire,
    )
    return payload, tilejson, len(inputs), n_features


def mvts_to_genb_tileset(
    mvt_tiles: list[bytes], allow_tae: bool = False
) -> tuple[list[bytes], dict]:
    """Tileset conversion: MVT tiles -> gen-B payloads sharing ONE
    central TileJSON (global layer/column ids via
    `covt/genb.build_layer_table` — the reference's deployment shape:
    `CovtConverter.java:183-188` writes one metadata file per tileset,
    not per tile). The returned sidecar decodes every payload, so a
    single .mbtiles archive (metadata key ``json``) is self-sufficient.
    """
    from cov_tiles_spark.covt.genb import build_layer_table, encode_tile_genb

    per_tile = [_genb_inputs(t)[0] for t in mvt_tiles]
    table, tilejson = build_layer_table(per_tile)
    payloads = [
        encode_tile_genb(
            inputs,
            optimize_metadata=True,
            geometry_encoding="best",
            layer_table=table,
            allow_tae=allow_tae,
        )[0]
        for inputs in per_tile
    ]
    return payloads, tilejson


def verify_genb_roundtrip(
    payload: bytes, tilejson: dict, mvt_layers: list[MvtLayer],
    any_order: bool = False,
) -> bool:
    """Gen-B round-trip oracle: decode our gen-B tile and compare
    feature-for-feature with the MVT decode (same rule as
    ``verify_roundtrip``). ``any_order=True`` compares feature
    multisets — required when the encoder reordered features (the
    reference's own spec re-sorts id-sorted layers the same way,
    covtDecoder.spec.ts:105-108)."""
    from cov_tiles_spark.covt.genb import decode_tile_genb

    try:
        decoded = decode_tile_genb(payload, tilejson)
    except Exception:
        return False
    return _features_match(decoded, mvt_layers, any_order=any_order)


def verify_roundtrip(covt_bytes: bytes, mvt_layers: list[MvtLayer]) -> bool:
    """Reference round-trip oracle: our decode of our COVT must reproduce
    the MVT decode feature-for-feature (geometry exact, properties equal
    for non-null values)."""
    try:
        decoded = decode_covt(covt_bytes)
    except Exception:
        return False
    return _features_match(decoded, mvt_layers)


def covt_to_mvt(
    covt_bytes: bytes | None = None,
    *,
    genb: bytes | None = None,
    tilejson: dict | None = None,
    extent: int | dict[str, int] = 4096,
) -> bytes:
    """Reverse transcode: a COVT tile (gen-A bytes, or gen-B bytes +
    TileJSON sidecar) -> MVT bytes, completing the interop matrix (the
    reference ships only MVT->COVT, `CovtConverter.java:61-140`; a user
    leaving the format needs the way back).

    Geometry follows loadGeometry semantics both ways (closed polygon
    rings re-emit ClosePath; multipoints one MoveTo per point), so
    ``decode_mvt(covt_to_mvt(t)) == decode-features(t)`` exactly; MVT
    byte layout may differ from any original tile (command grouping is
    not round-trip-preserved). ``extent`` is an int for all layers or a
    per-layer dict (gen-A tiles do not store extent; gen-B callers can
    pass the sidecar's value).
    """
    if (covt_bytes is None) == (genb is None):
        raise ValueError("pass exactly one of covt_bytes or genb")
    if genb is not None:
        from cov_tiles_spark.covt.genb import decode_tile_genb

        decoded = decode_tile_genb(genb, tilejson)
    else:
        decoded = decode_covt(covt_bytes)

    # OGC type (geometry.ts:1-8; multi-types collapse to their base: MVT
    # carries multiplicity in the command stream, not the type byte)
    to_mvt_type = {0: 1, 1: 2, 2: 3, 3: 1, 4: 2, 5: 3}
    layers = []
    for name, lay in decoded.items():
        feats = [
            {
                "id": f.get("id"),
                "geom_type": to_mvt_type[int(f["geometry_type"])],
                "parts": f["geometry"],
                "properties": {
                    k: v for k, v in f["properties"].items() if v is not None
                },
            }
            for f in lay.features()
        ]
        ext = extent.get(name, 4096) if isinstance(extent, dict) else extent
        layers.append((name, feats, ext))
    return encode_mvt(layers)


def _canon_key(geom, props, fid):
    """Order-insensitive feature key: id + geometry + sorted properties.
    Float values key through ``round(v, 2)`` — coarse enough to survive
    float32 round-trip drift in the low digits, fine enough that two
    features identical except for float properties align with their own
    pair instead of being cross-paired by the stable sort (they are
    still checked pairwise at full tolerance after alignment). Non-float
    values normalize through str() so numpy scalars key identically to
    Python ones."""
    gk = tuple(
        tuple((float(x), float(y)) for x, y in part) for part in geom
    )
    pk = tuple(
        sorted(
            (
                k,
                f"f:{round(float(v), 2):.2f}"
                if isinstance(v, (float, np.floating))
                else str(v),
            )
            for k, v in props.items()
            if v is not None
        )
    )
    return (fid is None, int(fid or 0), gk, pk)


def _features_match(
    decoded, mvt_layers: list[MvtLayer], any_order: bool = False
) -> bool:
    mvt_map = {l.name: l for l in mvt_layers if l.features}
    if set(decoded) != set(mvt_map):
        return False
    for name, lay in decoded.items():
        feats = lay.features()
        src = mvt_map[name].features
        if len(feats) != len(src):
            return False
        if any_order:
            # multiset compare under a canonical sort: the per-index
            # checks below then run pairwise on aligned features
            feats = sorted(
                feats,
                key=lambda a: _canon_key(
                    a["geometry"], a["properties"], a.get("id")
                ),
            )
            src = sorted(
                src, key=lambda b: _canon_key(b.geometry, b.properties, b.id)
            )
        for a, b in zip(feats, src):
            if a["geometry"] != b.geometry:
                return False
            for k, v in b.properties.items():
                if v is None:
                    continue
                got = a["properties"].get(k)
                if isinstance(v, float):
                    if got is None or abs(float(got) - v) > 1e-6 * max(1.0, abs(v)):
                        return False
                elif got != v:
                    return False
    return True


def _transcode_batches(
    batches: Iterator[pd.DataFrame], reorder_genb: bool = False,
    allow_tae_genb: bool = False, simplify_tolerance: int = 0,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for _, row in pdf.iterrows():
            raw = bytes(row["content"])
            if raw[:2] == b"\x1f\x8b":  # gzip source (S3)
                raw = _gzip.decompress(raw)
            m = _ZXY_RE.search(row["path"])
            z, x, y = (int(m.group(i)) for i in (1, 2, 3)) if m else (-1, -1, -1)
            if simplify_tolerance > 0:
                from cov_tiles_spark.covt.mvt import encode_mvt_layers
                from cov_tiles_spark.spatial.generalize import (
                    simplify_mvt_layers,
                )

                slim, _ = simplify_mvt_layers(
                    decode_mvt(raw), simplify_tolerance
                )
                # mvt_bytes below stays the SOURCE size, so the ratio
                # columns then include the generalization gain (opt-in)
                enc_src = encode_mvt_layers(slim)
            else:
                enc_src = raw
            covt, n_layers, n_features = mvt_to_covt(enc_src)
            mvt_layers = decode_mvt(enc_src)
            ok = verify_roundtrip(covt, mvt_layers)
            genb, tilejson, _, _ = mvt_to_genb(
                enc_src, reorder=reorder_genb, allow_tae=allow_tae_genb
            )
            genb_ok = verify_genb_roundtrip(
                genb, tilejson, mvt_layers, any_order=reorder_genb
            )
            rows.append(
                {
                    "path": os.path.basename(row["path"]),
                    "z": z, "x": x, "y": y,
                    "mvt_bytes": len(raw),
                    "covt_bytes": len(covt),
                    "genb_bytes": len(genb),
                    "gzip_mvt_bytes": len(_gzip.compress(raw, 6)),
                    "gzip_covt_bytes": len(_gzip.compress(covt, 6)),
                    "n_layers": n_layers,
                    "n_features": n_features,
                    "verified": ok,
                    "genb_verified": genb_ok,
                    "payload": covt,
                }
            )
        yield pd.DataFrame(rows) if rows else pd.DataFrame(
            columns=[c.split()[0] for c in TRANSCODE_SCHEMA.split(", ")]
        )


def transcode_mvt_directory(
    spark: SparkSession, glob_path: str, reorder_genb: bool = False,
    allow_tae_genb: bool = False, simplify_tolerance: int = 0,
) -> DataFrame:
    """Transcode every .mvt/.pbf under ``glob_path`` to COVT, verified.

    ``reorder_genb=True`` turns on the per-layer feature-order argmin
    for the gen-B encode (see :func:`mvt_to_genb`) — the offline/parity
    setting (~3x encode cost, never larger output).

    ``simplify_tolerance>0`` runs the opt-in generalization pass
    (spatial/generalize.py `simplify_mvt_layers`: DP line
    simplification, points/polygons untouched) before both encodes;
    roundtrip verification then runs against the simplified geometry,
    and the `mvt_bytes` column keeps the SOURCE size so the ratio
    columns include the generalization gain. Default 0 = byte-identical
    to the fixture-gated path."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{mvt,pbf}")
        .load(glob_path)
        .select("path", "content")
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _transcode_batches(
            batches, reorder_genb=reorder_genb, allow_tae_genb=allow_tae_genb,
            simplify_tolerance=simplify_tolerance,
        )

    return files.mapInPandas(_batches, schema=TRANSCODE_SCHEMA)


EXPORT_SCHEMA = (
    "path string, z int, x int, y int, covt_bytes long, mvt_bytes long, "
    "n_layers int, n_features long, verified boolean, payload binary"
)

_ZXY_ANY_RE = re.compile(r"(\d+)[_\-/](\d+)[_\-/](\d+)\.covt$")


def _export_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for _, row in pdf.iterrows():
            raw = bytes(row["content"])
            m = _ZXY_ANY_RE.search(row["path"])
            z, x, y = (int(m.group(i)) for i in (1, 2, 3)) if m else (-1, -1, -1)
            mvt = covt_to_mvt(raw)
            # inline verification: decoded features of the exported MVT
            # must reproduce the COVT decode geometry-for-geometry
            src = decode_covt(raw)
            back = {l.name: l for l in decode_mvt(mvt) if l.features}
            ok = set(src) == set(back) and all(
                [f["geometry"] for f in src[n].features()]
                == [f.geometry for f in back[n].features]
                for n in src
            )
            n_features = sum(len(l.features) for l in back.values())
            rows.append(
                {
                    "path": os.path.basename(row["path"]),
                    "z": z, "x": x, "y": y,
                    "covt_bytes": len(raw),
                    "mvt_bytes": len(mvt),
                    "n_layers": len(back),
                    "n_features": n_features,
                    "verified": ok,
                    "payload": mvt,
                }
            )
        yield pd.DataFrame(rows) if rows else pd.DataFrame(
            columns=[c.split()[0] for c in EXPORT_SCHEMA.split(", ")]
        )


def export_mbtiles_to_mvt(spark: SparkSession, path: str) -> DataFrame:
    """Distributed reverse transcode of a COVT .mbtiles archive -> MVT
    payload rows. Gen-B archives are decoded with the TileJSON sidecar
    the archive itself carries (metadata key ``json``, written by
    ``sources/mbtiles.write_mbtiles``); gen-A archives need no sidecar.
    The format is sniffed per tile (gen-B leads with the version
    nibble-header byte; decode falls back to gen-A on parse failure), so
    mixed archives also work. Same verified output schema as
    :func:`export_covt_directory`."""
    import json as _json

    from cov_tiles_spark.sources.mbtiles import (
        read_mbtiles,
        read_mbtiles_metadata,
    )

    meta = read_mbtiles_metadata(path)
    tilejson = _json.loads(meta["json"]) if "json" in meta else None
    tiles = read_mbtiles(spark, path)

    def _export(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cov_tiles_spark.covt.genb import decode_tile_genb

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                raw = bytes(row["tile_data"])
                try:
                    decoded = decode_tile_genb(raw, tilejson)
                    mvt = covt_to_mvt(genb=raw, tilejson=tilejson)
                except Exception:
                    decoded = decode_covt(raw)
                    mvt = covt_to_mvt(raw)
                back = {l.name: l for l in decode_mvt(mvt) if l.features}
                ok = set(decoded) == set(back) and all(
                    [f["geometry"] for f in decoded[n].features()]
                    == [f.geometry for f in back[n].features]
                    for n in decoded
                )
                rows.append(
                    {
                        "path": f"{row['z']}/{row['x']}/{row['y']}",
                        "z": int(row["z"]), "x": int(row["x"]),
                        "y": int(row["y"]),
                        "covt_bytes": len(raw),
                        "mvt_bytes": len(mvt),
                        "n_layers": len(back),
                        "n_features": sum(len(l.features) for l in back.values()),
                        "verified": ok,
                        "payload": mvt,
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[c.split()[0] for c in EXPORT_SCHEMA.split(", ")]
            )

    return tiles.mapInPandas(_export, schema=EXPORT_SCHEMA)


def export_covt_directory(spark: SparkSession, glob_path: str) -> DataFrame:
    """Distributed reverse transcode: every gen-A .covt under
    ``glob_path`` -> MVT payloads, each export verified inline
    (one file per task row via the binaryFile source — same scan shape
    as :func:`transcode_mvt_directory`, so partition pruning and file
    listing scale identically)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.covt")
        .load(glob_path)
        .select("path", "content")
    )
    return files.mapInPandas(_export_batches, schema=EXPORT_SCHEMA)
