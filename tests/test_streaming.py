"""Structured Streaming incremental materialization + compaction."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cov_tiles_spark.io.synth import images_df
from cov_tiles_spark.pipeline.lineage import IcebergLite
from cov_tiles_spark.pipeline.materialize import decode_tiles, materialize_tiles
from cov_tiles_spark.streaming.incremental import (
    compact_tiles,
    start_incremental_materialize,
)

ZOOMS = [2, 5]


def test_incremental_stream_and_compaction(spark, tmp_path):
    landing = str(tmp_path / "landing")
    lake_root = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    # two "arrivals" of the corpus, written as separate parquet drops
    full = images_df(spark, 400, partitions=2).cache()
    a = full.filter(F.col("image_id") < "img-000000000200")
    b = full.filter(F.col("image_id") >= "img-000000000200")
    a.write.parquet(f"{landing}/drop_a")
    b.write.parquet(f"{landing}/drop_b")

    q = start_incremental_materialize(
        spark, f"{landing}/*", lake_root, ckpt, ZOOMS, trigger_once=True
    )
    q.awaitTermination(300)

    lake = IcebergLite(spark, lake_root)
    partials = lake.read_table("tiles_stream")
    assert partials.agg(F.sum("num_features")).collect()[0][0] == 400 * len(ZOOMS)

    # compaction merges per-batch partials into one payload per tile
    compacted = compact_tiles(partials).cache()
    per_tile = compacted.groupBy("z", "x", "y").count()
    assert per_tile.agg(F.max("count")).collect()[0][0] == 1
    assert compacted.agg(F.sum("num_features")).collect()[0][0] == 400 * len(ZOOMS)

    # compacted decode == the batch pipeline's decode on the same input
    batch = materialize_tiles(full, ZOOMS, with_mvt_baseline=False)
    d_stream = decode_tiles(compacted).orderBy("z", "x", "y", "feature_id")
    d_batch = decode_tiles(batch).orderBy("z", "x", "y", "feature_id")
    assert d_stream.exceptAll(d_batch).count() == 0
    assert d_batch.exceptAll(d_stream).count() == 0
