"""A/B the pyramid rollup vs the direct per-zoom exchange.

Same corpus, same z2-z10 output semantics (zoom-independent cap key on
BOTH sides so the payloads are byte-comparable), fresh timings; writes
its section into BENCH/BASELINE.md idempotently.

Usage: python scripts/pyramid_bench.py [n_records] [cap]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cov_tiles_spark.session import get_spark  # noqa: E402
from cov_tiles_spark.io.synth import images_df  # noqa: E402
from cov_tiles_spark.pipeline.materialize import (  # noqa: E402
    assign_tiles,
    encode_assigned,
)
from cov_tiles_spark.pipeline.pyramid import materialize_pyramid  # noqa: E402
from _sections import replace_section  # noqa: E402

COLS = ["image_id", "caption", "fmt", "w", "h", "phash", "lon", "lat"]


def _shuffle_totals(spark) -> tuple[int, int]:
    """(bytes, records) shuffle-written so far, from the UI REST API —
    the objective exchange-volume metric wall-clock can't show on one
    box (local shuffle is memory bandwidth; on a real cluster it is
    network + disk)."""
    import json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages")
    )
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    os.environ.pop("SPARK_GRAFT_CPUS", None)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("pyramid-bench")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    imgs = images_df(spark, n).persist()
    imgs.count()  # synthesize once; both paths read the cache

    # warm the Python worker pool + codegen
    materialize_pyramid(imgs, 4, 5, max_features_per_tile=1000,
                        with_mvt_baseline=False, row_bound=n).count()

    def run(label, df):
        b0, r0 = _shuffle_totals(spark)
        t = time.time()
        agg = df.agg(
            F.count("*").alias("tiles"),
            F.sum("num_features").alias("features"),
            F.sum("payload_bytes").alias("bytes"),
        ).collect()[0]
        dt = time.time() - t
        b1, r1 = _shuffle_totals(spark)
        sh = (b1 - b0, r1 - r0)
        print(f"{label}: {dt:.1f}s tiles={agg['tiles']} "
              f"features={agg['features']} bytes={agg['bytes']} "
              f"shuffleMB={sh[0] / 1e6:.1f} shuffleRows={sh[1]}")
        return dt, agg, sh

    def condition(zmin, zmax, cap):
        t_dir, a_dir, sh_dir = run(
            f"direct z{zmin}-z{zmax} cap={cap}",
            encode_assigned(
                assign_tiles(imgs.select(*COLS), list(range(zmin, zmax + 1))),
                max_features_per_tile=cap,
                with_mvt_baseline=False,
                sample_key=F.xxhash64("image_id"),
            ),
        )
        t_roll, a_roll, sh_roll = run(
            f"rollup z{zmin}-z{zmax} cap={cap}",
            materialize_pyramid(imgs, zmin, zmax, max_features_per_tile=cap,
                                with_mvt_baseline=False, row_bound=n),
        )
        return (t_dir, sh_dir, t_roll, sh_roll,
                tuple(a_dir) == tuple(a_roll), a_roll)

    # Condition A — planetary analogue: cap binds at every level
    # (records >> tiles(zmax) * cap), the 10^12-records/20k-cap shape
    # scaled into the sandbox.
    ta_dir, sha_dir, ta_roll, sha_roll, eq_a, agg_a = condition(2, 6, 50)
    # Condition B — sparse regime: cap never binds (records <<
    # tiles * cap); the rollup degrades to per-level exchanges of the
    # full corpus and the single-exchange direct path is the right plan.
    tb_dir, shb_dir, tb_roll, shb_roll, eq_b, agg_b = condition(2, 10, 20_000)

    def row(cond, zs, cap, td, shd, tr, shr, eq):
        ratio = shd[0] / shr[0] if shr[0] else float("inf")
        return (
            f"| {cond} | {zs} | {cap} | {td:.1f}s / {shd[0] / 1e6:.0f} MB / "
            f"{shd[1]:,} rows | {tr:.1f}s / {shr[0] / 1e6:.0f} MB / "
            f"{shr[1]:,} rows | {ratio:.1f}x | {eq} |"
        )

    lines = [
        "## Pyramid rollup vs direct per-zoom exchange (pipeline/pyramid.py)",
        "",
        f"N={n:,} records, local[32], zoom-independent cap key on both "
        "sides; tests/test_pyramid.py proves byte-identical payloads, and "
        "both conditions below re-verified aggregate equality. Shuffle "
        "volume is the UI REST shuffleWrite delta — the objective "
        "cluster-cost metric: on one box a shuffle is a memcpy, on 1000 "
        "executors it is the network+disk bill.",
        "",
        "| condition | zooms | cap | direct wall / shuffle | rollup wall / "
        "shuffle | shuffle reduction | equal |",
        "|---|---|---|---|---|---|---|",
        row("A: cap binds (planetary analogue of 10^12 recs / 20k cap)",
            "z2-z6", 50, ta_dir, sha_dir, ta_roll, sha_roll, eq_a),
        row("B: cap never binds (sparse)", "z2-z10", "20,000",
            tb_dir, shb_dir, tb_roll, shb_roll, eq_b),
        "",
        "Reading: the rollup replaces the direct path's O(records x zooms) "
        "exchange with one full-corpus exchange at zmax plus "
        "O(tiles(z) x cap) per coarser level, inserting the window cap "
        "only where `4^z x cap` is below the current row bound. Wall "
        "times on one box are ~parity (shuffle is memory-bandwidth "
        "here and Python encode cost is identical by construction); the "
        "shuffle-bytes column is what scales to the cluster. At 10^12 "
        "records every zoom <= ~z12 is in condition A, where the volume "
        "reduction approaches |zooms|x; in condition B "
        "materialize_tiles remains the default plan. Condition A "
        f"aggregates: tiles={agg_a['tiles']}, features={agg_a['features']}; "
        f"condition B: tiles={agg_b['tiles']}, "
        f"features={agg_b['features']}.",
        "",
    ]
    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "BASELINE.md",
    )
    replace_section(
        md,
        "## Pyramid rollup vs direct per-zoom exchange",
        "\n".join(lines) + "\n",
    )
    spark.stop()


if __name__ == "__main__":
    main()
