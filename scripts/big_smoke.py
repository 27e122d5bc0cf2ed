"""Large-corpus robustness smoke: 1M records through the full pipeline at
local[32] (8x the bench scale). Appends a section to BENCH/BASELINE.md.

Usage: python scripts/big_smoke.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from cov_tiles_spark.io.synth import images_df
    from cov_tiles_spark.pipeline.materialize import materialize_tiles
    from cov_tiles_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    imgs = images_df(spark, n, partitions=128)
    tiles = materialize_tiles(imgs, [2, 4, 6, 8, 10, 12], with_mvt_baseline=False)
    stats = tiles.agg(
        F.count("*").alias("tiles"),
        F.sum("num_features").alias("nf"),
        F.sum("payload_bytes").alias("covt"),
        F.max("num_features").alias("max_nf"),
    ).collect()[0]
    el = time.time() - t0
    result = {
        "sec": round(el, 1),
        "tiles": stats.tiles,
        "features": stats.nf,
        "covt_mb": round(stats.covt / 1e6, 1),
        "max_tile_features": stats.max_nf,
        "features_per_sec": round(stats.nf / el),
    }
    print(json.dumps(result))
    from _sections import replace_section

    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "BASELINE.md",
    )
    replace_section(
        md,
        "## Large-corpus smoke (robustness at 8x the bench scale)",
        "## Large-corpus smoke (robustness at 8x the bench scale)\n\n"
        "| metric | value | config | source |\n|---|---|---|---|\n"
        f"| {n:,} records, z2-z12 pyramid | {stats.tiles:,} tiles / "
        f"{stats.nf / 1e6:.2f}M capped features / {stats.covt / 1e6:.1f} MB "
        f"payloads in {el:.1f}s ({stats.nf / el / 1000:.1f}k features/s) | "
        f"local[32], shuffle=128, cap=20k enforced (max tile = "
        f"{stats.max_nf}), no spill/OOM | this script |\n\n",
    )


if __name__ == "__main__":
    main()
