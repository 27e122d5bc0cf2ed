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
