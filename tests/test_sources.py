"""MBTiles source round-trip (SURVEY §2.1 S1)."""

from __future__ import annotations

from pathlib import Path

from cov_tiles_spark.sources.mbtiles import (
    read_mbtiles,
    write_mbtiles,
)


def test_mbtiles_roundtrip(spark, tmp_path):
    ref = Path("/root/reference/parser/js/data/omt")
    rows = []
    for p in sorted(ref.glob("*.mvt")):
        z, x, y = (int(v) for v in p.stem.split("_"))
        rows.append((z, x, y, p.read_bytes()))
    db = str(tmp_path / "test.mbtiles")
    write_mbtiles(rows, db)

    df = read_mbtiles(spark, db)
    got = {(r.z, r.x, r.y): bytes(r.tile_data) for r in df.collect()}
    assert len(got) == len(rows)
    for z, x, y, data in rows:
        assert got[(z, x, y)] == data

    # zoom filter prunes
    z5 = read_mbtiles(spark, db, zooms=[5]).collect()
    assert {(r.z, r.x, r.y) for r in z5} == {(z, x, y) for z, x, y, _ in rows if z == 5}


def test_mbtiles_genb_archive_self_sufficient(tmp_path):
    """A gen-B .mbtiles archive carries its TileJSON sidecar in the
    standard metadata table, so decoding optimized-metadata tiles needs
    nothing outside the file."""
    import json

    from cov_tiles_spark.covt.genb import decode_tile_genb
    from cov_tiles_spark.covt.mvt import decode_mvt
    from cov_tiles_spark.pipeline.transcode import _features_match, mvt_to_genb
    from cov_tiles_spark.sources.mbtiles import read_mbtiles_metadata

    src = Path("/root/reference/parser/js/data/omt/4_3_9.mvt")
    payload, tilejson, _, _ = mvt_to_genb(src.read_bytes())
    db = str(tmp_path / "genb.mbtiles")
    write_mbtiles(
        [(4, 3, 9, payload)],
        db,
        metadata={"format": "covt-genb", "json": tilejson},
    )

    meta = read_mbtiles_metadata(db)
    assert meta["format"] == "covt-genb"
    import sqlite3

    con = sqlite3.connect(db)
    (blob,) = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=4"
    ).fetchone()
    con.close()
    decoded = decode_tile_genb(bytes(blob), json.loads(meta["json"]))
    assert _features_match(decoded, decode_mvt(src.read_bytes()))


def test_export_mbtiles_to_mvt_both_formats(spark, tmp_path):
    """A mixed .mbtiles archive (gen-B tiles + sidecar, plus a gen-A
    tile) exports back to MVT as a Spark job, every tile verified."""
    from cov_tiles_spark.pipeline.transcode import (
        export_mbtiles_to_mvt,
        mvt_to_covt,
        mvts_to_genb_tileset,
    )

    ref = Path("/root/reference/parser/js/data/omt")
    genb_paths = sorted(ref.glob("*.mvt"))[:3]
    payloads, tilejson = mvts_to_genb_tileset(
        [p.read_bytes() for p in genb_paths]
    )
    rows = []
    for p, payload in zip(genb_paths, payloads):
        z, x, y = (int(v) for v in p.stem.split("_"))
        rows.append((z, x, y, payload))
    # one gen-A tile in the same archive (format sniffed per tile)
    p = sorted(ref.glob("*.mvt"))[3]
    z, x, y = (int(v) for v in p.stem.split("_"))
    covt, _, _ = mvt_to_covt(p.read_bytes())
    rows.append((z, x, y, covt))

    db = str(tmp_path / "mixed.mbtiles")
    write_mbtiles(rows, db, metadata={"format": "covt", "json": tilejson})
    out = export_mbtiles_to_mvt(spark, db).collect()
    assert len(out) == 4
    assert all(r.verified for r in out), [r.path for r in out if not r.verified]
    assert all(r.mvt_bytes > 0 and r.n_features > 0 for r in out)


def test_export_mbtiles_with_tae_tiles(spark, tmp_path):
    """An archive whose gen-B tiles use the TAE extension column still
    exports back to MVT verified (TAE decode rebuilds the standard SoA,
    so the whole serving path is extension-transparent)."""
    from cov_tiles_spark.pipeline.transcode import (
        export_mbtiles_to_mvt,
        mvts_to_genb_tileset,
    )

    ref = Path("/root/reference/parser/js/data/omt")
    paths = sorted(ref.glob("*.mvt"))[-2:]  # z7/z8: TAE-rich layers
    srcs = [p.read_bytes() for p in paths]
    base, _ = mvts_to_genb_tileset(srcs)
    payloads, tilejson = mvts_to_genb_tileset(srcs, allow_tae=True)
    assert sum(map(len, payloads)) < sum(map(len, base))  # TAE engaged
    rows = []
    for p, payload in zip(paths, payloads):
        z, x, y = (int(v) for v in p.stem.split("_"))
        rows.append((z, x, y, payload))
    db = str(tmp_path / "tae.mbtiles")
    write_mbtiles(rows, db, metadata={"format": "covt", "json": tilejson})
    out = export_mbtiles_to_mvt(spark, db).collect()
    assert len(out) == 2 and all(r.verified for r in out)
