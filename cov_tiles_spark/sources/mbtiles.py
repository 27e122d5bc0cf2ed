"""MBTiles (SQLite) tile source — the reference's S1 scan
(`MvtUtils.java:27-41`: ``SELECT tile_data FROM tiles WHERE tile_column=?
AND tile_row=? AND zoom_level=?``).

Spark-first shape: enumerate (zoom_level, tile_column, tile_row) key
ranges on the driver (cheap metadata query), then fetch tile blobs in
parallel with ``mapInPandas`` — each task opens its own read-only SQLite
connection (sqlite supports concurrent readers). On a cluster the
.mbtiles file must be on shared/local storage per executor; for object
stores you would convert once to parquet with ``mbtiles_to_parquet``.

The stdlib ``sqlite3`` is used instead of JDBC because the sandbox ships
no SQLite JDBC driver jar; the access pattern (point lookups on the tiles
B-tree) is identical.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TILE_SCHEMA = "z int, x int, y int, tile_data binary"


def read_mbtiles(
    spark: SparkSession,
    path: str,
    zooms: list[int] | None = None,
    partitions: int = 32,
) -> DataFrame:
    """Distributed scan of an MBTiles file -> (z, x, y, tile_data).

    y is flipped from the TMS row stored in MBTiles to the XYZ convention
    the rest of the engine uses.
    """
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        where = (
            f"WHERE zoom_level IN ({','.join(map(str, zooms))})" if zooms else ""
        )
        keys = con.execute(
            f"SELECT zoom_level, tile_column, tile_row FROM tiles {where}"
        ).fetchall()
    finally:
        con.close()

    if not keys:
        return spark.createDataFrame([], TILE_SCHEMA)

    keys_df = spark.createDataFrame(keys, "zoom_level int, tile_column int, tile_row int")
    keys_df = keys_df.repartition(min(partitions, max(1, len(keys) // 64 + 1)))

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            for pdf in batches:
                rows = []
                for z, col, row in pdf.itertuples(index=False):
                    blob = con.execute(
                        "SELECT tile_data FROM tiles WHERE zoom_level=? "
                        "AND tile_column=? AND tile_row=?",
                        (int(z), int(col), int(row)),
                    ).fetchone()
                    if blob is None:
                        continue
                    rows.append(
                        {
                            "z": int(z),
                            "x": int(col),
                            "y": (1 << int(z)) - 1 - int(row),  # TMS -> XYZ
                            "tile_data": blob[0],
                        }
                    )
                yield pd.DataFrame(rows) if rows else pd.DataFrame(
                    columns=["z", "x", "y", "tile_data"]
                )
        finally:
            con.close()

    return keys_df.mapInPandas(fetch, schema=TILE_SCHEMA)


def mbtiles_to_parquet(spark: SparkSession, path: str, out: str) -> None:
    """One-time conversion for object-store deployments (partition-pruned
    reads on (z) afterwards — the cloud-optimized P5/P6 path)."""
    read_mbtiles(spark, path).write.partitionBy("z").mode("overwrite").parquet(out)


def write_mbtiles(
    rows: list[tuple[int, int, int, bytes]],
    path: str,
    metadata: dict | None = None,
) -> None:
    """Tiny MBTiles writer (tests + local export). rows: (z, x, y, data).

    ``metadata`` entries land in the spec's name/value metadata table;
    dict/list values are JSON-encoded. Gen-B archives store their
    TileJSON sidecar under the standard ``json`` key (the same
    externalized-names channel the reference's converter writes,
    `CovtConverter.java:183-188`), so one .mbtiles file is
    self-sufficient to decode optimized-metadata tiles.
    """
    con = sqlite3.connect(path)
    try:
        con.execute(
            "CREATE TABLE IF NOT EXISTS tiles (zoom_level INTEGER, "
            "tile_column INTEGER, tile_row INTEGER, tile_data BLOB)"
        )
        con.execute(
            "CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)"
        )
        con.executemany(
            "INSERT OR REPLACE INTO tiles VALUES (?,?,?,?)",
            [(z, x, (1 << z) - 1 - y, sqlite3.Binary(d)) for z, x, y, d in rows],
        )
        if metadata:
            import json as _json

            con.execute(
                "CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT)"
            )
            con.execute(
                "CREATE UNIQUE INDEX IF NOT EXISTS metadata_index ON "
                "metadata (name)"
            )
            con.executemany(
                "INSERT OR REPLACE INTO metadata VALUES (?,?)",
                [
                    (
                        k,
                        v
                        if isinstance(v, str)
                        else _json.dumps(v, separators=(",", ":")),
                    )
                    for k, v in metadata.items()
                ],
            )
        con.commit()
    finally:
        con.close()


def read_mbtiles_metadata(path: str) -> dict[str, str]:
    """The metadata name/value table as a dict ({} if absent)."""
    con = sqlite3.connect(path)
    try:
        try:
            return dict(con.execute("SELECT name, value FROM metadata"))
        except sqlite3.OperationalError:
            return {}
    finally:
        con.close()
