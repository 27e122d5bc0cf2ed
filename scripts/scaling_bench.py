"""Two-parallelism scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox stand-in per driver
instruction: the same job at two parallelism levels).

Runs the full flagship pipeline (synthesize/decode/phash -> assign
z2-z10 pyramid -> streaming COVT encode) at three parallelism levels in
separate JVMs:

- local[2] pinned to 2 cores (taskset) and local[8] pinned to 8 cores —
  the **uncontended N -> 4N** comparison: each condition genuinely has
  N cores (a bare local[N] lets JVM shuffle/GC/Arrow threads spill onto
  the other cores and flatters the small-N baseline).
- local[32] on all 32 cores — the saturated upper end, where Python
  workers + JVM auxiliary threads oversubscribe the box and shared
  memory bandwidth caps the gain (a single-box artifact a real
  multi-executor cluster does not have).

Writes BENCH/BASELINE.md. Usage: python scripts/scaling_bench.py [n]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
from cov_tiles_spark.session import get_spark
from cov_tiles_spark.io.synth import images_df
from cov_tiles_spark.pipeline.materialize import materialize_tiles
from pyspark.sql import functions as F

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(app_name=f"scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")

ZOOMS = [2, 3, 4, 5, 6, 7, 8, 9, 10]

def job():
    imgs = images_df(spark, n, partitions=cores * 4)
    tiles = materialize_tiles(imgs, ZOOMS, with_mvt_baseline=False)
    return tiles.agg(F.count("*").alias("tiles"),
                     F.sum("num_features").alias("nf"),
                     F.sum("payload_bytes").alias("covt")).collect()[0]

job()  # warm-up (JIT, python-worker spawn)
t0 = time.time()
stats = job()
elapsed = time.time() - t0
print(json.dumps({"cores": cores, "sec": elapsed, "tiles": stats.tiles,
                  "features": stats.nf, "covt_bytes": stats.covt,
                  "tiles_per_sec": stats.tiles / elapsed,
                  "features_per_sec": stats.nf / elapsed}))
"""


def run(cores: int, n: int, cpuset: str | None) -> dict:
    cmd = [sys.executable, "-c", RUNNER, str(cores), str(n)]
    if cpuset:
        cmd = ["taskset", "-c", cpuset] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    r2 = run(2, n, "0-1")
    r8 = run(8, n, "0-7")
    r32 = run(32, n, None)
    eff_pinned = (r8["features_per_sec"] / r2["features_per_sec"]) / 4
    eff_sat = (r32["features_per_sec"] / r8["features_per_sec"]) / 4
    result = {
        "n_images": n,
        "local2_pinned": r2,
        "local8_pinned": r8,
        "local32": r32,
        "scaling_efficiency_pinned_2_to_8": round(eff_pinned, 3),
        "scaling_efficiency_8_to_32_saturated": round(eff_sat, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    # preserve every section other scripts appended (decode parity,
    # transcode parity, codec sweep, notes): everything from the marker on
    marker = "<!-- scaling-bench-end -->\n"
    tail = ""
    try:
        old = open("BENCH/BASELINE.md").read()
        if marker in old:
            tail = old.split(marker, 1)[1]
        else:
            i = old.find("\n## ")
            if i >= 0:
                tail = old[i + 1 :]
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured in-sandbox\n\n"
            "Flagship pipeline (synthesize+decode+phash -> assign z2-z10 "
            "pyramid -> inline cap -> streaming COVT encode via "
            "mapInPandas over one hash(z,x,y) exchange) over the "
            f"deterministic image+caption corpus, N={n:,} records; "
            "warm-up run first, measured second run, fresh JVM per level.\n\n"
            "`local[N]` *pinned* means the JVM is confined to N cores with "
            "taskset, so the comparison is a true N-core vs 4N-core "
            "condition (unpinned local[N] lets JVM shuffle/GC/Arrow "
            "threads use all 32 cores and flatters the baseline).\n\n"
            "| metric | value | config | source |\n|---|---|---|---|\n"
            f"| throughput N=2 (pinned) | {r2['features_per_sec']:.0f} features/s "
            f"({r2['tiles_per_sec']:.0f} tiles/s) | {r2['tiles']} tiles, {r2['sec']:.1f}s | this script |\n"
            f"| throughput 4N=8 (pinned) | {r8['features_per_sec']:.0f} features/s "
            f"({r8['tiles_per_sec']:.0f} tiles/s) | {r8['tiles']} tiles, {r8['sec']:.1f}s | this script |\n"
            f"| **scaling efficiency N -> 4N** | **{eff_pinned:.3f}** | pinned 2 -> 8 cores, "
            "target >= 0.8 (BASELINE.json) | this script |\n"
            f"| throughput local[32] (saturated box) | {r32['features_per_sec']:.0f} features/s | "
            f"{r32['tiles']} tiles, {r32['sec']:.1f}s | this script |\n"
            f"| efficiency 8 -> 32 (saturated) | {eff_sat:.3f} | 32 Python workers + JVM aux "
            "threads oversubscribe the 32-core box; shared-memory-bandwidth "
            "artifact of single-box 4N simulation | this script |\n"
            f"| COVT payload bytes | {r32['covt_bytes']:,} | z2-z10 pyramid | this script |\n\n"
            "Skew/efficiency design notes: hot low-zoom tiles are bounded by a "
            "deterministic per-tile cap applied inline in the sorted stream "
            "(no second exchange); fine-grained hash partitioning (8x "
            "parallelism) prevents capped hot tiles from colliding in one "
            "partition (measured 38.8k-row stragglers at 3x); the encode "
            "stage is mapInPandas (per-batch Arrow protocol) instead of "
            "applyInPandas (per-group, ~6 ms/group measured, which "
            "serialized the stage).\n\n"
        )
        f.write(marker)
        if tail:
            f.write("\n" + tail.lstrip("\n"))


if __name__ == "__main__":
    main()
