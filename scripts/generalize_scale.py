"""Pinned two-parallelism scaling evidence for the generalization ops.

Same protocol as scripts/scaling_bench.py (north_rule stand-in: the same
job at two parallelism levels, each condition taskset-pinned so N cores
means N cores): DP-simplify 1M synthesized polylines (~20M vertices, the
q_simplify_lines corpus recipe) through `simplify_lines`, report rows/s
at 2 and 8 cores plus the 2->8 scaling efficiency. The operator is
map-only, so the efficiency ceiling is the Python-worker pool, not any
exchange. Appends nothing; prints a markdown row for BENCH/BASELINE.md.

Usage: python scripts/generalize_scale.py [n_rows]
"""

from __future__ import annotations

import json
import subprocess
import sys

MERGE_RUNNER = r"""
import json, sys, time
from pyspark.sql import functions as F
from cov_tiles_spark.session import get_spark
from cov_tiles_spark.spatial.generalize import merge_lines

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(app_name=f"merge-scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")

def job():
    # the q_merge_lines fragment recipe over n routes (~7 frags each)
    ev = spark.range(n).select(F.col("id").alias("event_id"))
    h = lambda i: F.pmod(F.col("event_id") * F.lit(40503)
                         + i * F.lit(2654435761), F.lit(2147483648))
    m = F.lit(8) + F.pmod(F.col("event_id"), F.lit(25))
    x_at = lambda i: (i * F.lit(100) + F.pmod(h(i), F.lit(37))).cast("long")
    y_at = lambda i: (F.pmod(F.col("event_id"), F.lit(97)) * F.lit(64)
                      + F.pmod(F.shiftright(h(i), 7), F.lit(64))).cast("long")
    k_at = lambda j: F.lit(2) + F.pmod(h(F.lit(100) + j), F.lit(3))
    c_at = lambda j: j * F.lit(2) + F.when(j == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(F.sequence(F.lit(0), j - 1), F.lit(0).cast("long"),
                    lambda acc, l: acc + (k_at(l) - F.lit(2)).cast("long")))
    frags = (ev.repartition(cores * 4)
             .select("event_id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"))
             .select("event_id", "j", c_at(F.col("j")).alias("start"))
             .where(F.col("start") < m - 1)
             .select(F.pmod(F.col("event_id"), F.lit(65536)).alias("g"),
                     (F.shiftleft(h(F.lit(200) + F.col("j")), 26)
                      + F.shiftleft(F.shiftright(F.col("event_id"), 16), 5)
                      + F.col("j")).alias("ord"),
                     F.transform(F.sequence(F.col("start"),
                                            F.least(F.col("start") + k_at(F.col("j")), m - 1)),
                                 x_at).alias("xs"),
                     F.transform(F.sequence(F.col("start"),
                                            F.least(F.col("start") + k_at(F.col("j")), m - 1)),
                                 y_at).alias("ys")))
    out = merge_lines(frags, ["g"], "ord")
    return out.agg(F.count("*").alias("chains"),
                   F.sum("n_frags").alias("frags")).collect()[0]

job()
t0 = time.time(); r = job(); el = time.time() - t0
print(json.dumps({"cores": cores, "sec": el, "chains": r.chains,
                  "frags": r.frags, "frags_per_sec": r.frags / el}))
"""

RUNNER = r"""
import json, sys, time
from pyspark.sql import functions as F
from cov_tiles_spark.session import get_spark
from cov_tiles_spark.spatial.generalize import simplify_lines

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(app_name=f"gen-scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")

def job():
    ev = spark.range(n).select(F.col("id").alias("event_id"))
    h = lambda i: F.pmod(F.col("event_id") * F.lit(40503)
                         + i * F.lit(2654435761), F.lit(2147483648))
    m = F.lit(7) + F.pmod(F.col("event_id"), F.lit(25))
    pl = ev.repartition(cores * 4).select(
        "event_id",
        F.transform(F.sequence(F.lit(0), m),
                    lambda i: (i * F.lit(100) + F.pmod(h(i), F.lit(37)))
                    .cast("long")).alias("xs"),
        F.transform(F.sequence(F.lit(0), m),
                    lambda i: F.pmod(F.shiftright(h(i), 7), F.lit(64))
                    .cast("long")).alias("ys"),
    )
    out = simplify_lines(pl, 16)
    return out.agg(F.count("*").alias("rows"), F.sum("n_in").alias("vin"),
                   F.sum("n_out").alias("vout")).collect()[0]

job()  # warm-up: python-worker spawn + imports
t0 = time.time(); r = job(); el = time.time() - t0
print(json.dumps({"cores": cores, "sec": el, "rows": r.rows,
                  "verts_in": r.vin, "verts_out": r.vout,
                  "rows_per_sec": r.rows / el}))
"""


def run(cores: int, n: int, cpuset: str, runner: str = None) -> dict:
    cmd = ["taskset", "-c", cpuset, sys.executable, "-c", runner or RUNNER,
           str(cores), str(n)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd="/root/repo")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    job = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].isdigit() else "simplify"
    n = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 1_000_000
    if job == "merge":
        a = run(2, n, "0-1", MERGE_RUNNER)
        b = run(8, n, "0-7", MERGE_RUNNER)
        eff = (b["frags_per_sec"] / a["frags_per_sec"]) / 4.0
        print(json.dumps({"n": n, "c2": a, "c8": b, "efficiency_2_to_8": eff}))
        print(f"| merge_lines {a['frags'] // 1000}k fragments | {a['sec']:.1f}s "
              f"({a['frags_per_sec']:.0f}/s) | {b['sec']:.1f}s "
              f"({b['frags_per_sec']:.0f}/s) | {eff:.3f} |")
        return
    a = run(2, n, "0-1")
    b = run(8, n, "0-7")
    eff = (b["rows_per_sec"] / a["rows_per_sec"]) / 4.0
    print(json.dumps({"n": n, "c2": a, "c8": b, "efficiency_2_to_8": eff}))
    print(f"| simplify_lines {n // 1000}k rows | {a['sec']:.1f}s "
          f"({a['rows_per_sec']:.0f}/s) | {b['sec']:.1f}s "
          f"({b['rows_per_sec']:.0f}/s) | {eff:.3f} |")


if __name__ == "__main__":
    main()
