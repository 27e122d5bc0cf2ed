"""Pinned A/B of one registry query across two checkouts of this repo.

Settles code-regression-vs-tenant-noise questions the unpinned
single-shot driver bench cannot (its timings fluctuate 2-6x on this
shared-tenant box): both sides run the SAME query on the SAME input in
fresh JVMs confined to the SAME cores (taskset), interleaved A,B,A,B,...
so a contended window hits both sides equally, and the per-side best is
compared.

Usage:
    python scripts/ab_pinned.py <dirA> <dirB> [query] [sf_dir] [reps]

dirA/dirB are repo roots (e.g. a `git worktree add` of an old round's
final commit vs the live tree). Prints one JSON line with per-side
per-JVM timings and the best-of comparison.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, ".")
from cov_tiles_spark.session import get_spark
import __spark_entry__ as e

query, sf_dir, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name=f"ab-{query}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()[query]
q(spark, sf_dir).count()  # warm: worker spawn, JIT, codegen
best = None
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.time()
    n = q(spark, sf_dir).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"sec": round(best, 3), "rows": n}))
"""


def run_once(repo: str, query: str, sf_dir: str, cores: int, cpuset: str) -> float:
    env = dict(os.environ, PYTHONPATH=repo, COV_ORACLE_DIR=os.path.join(repo, "oracles", "sf0.01"))
    out = subprocess.run(
        ["taskset", "-c", cpuset, sys.executable, "-c", RUNNER,
         query, sf_dir, str(cores)],
        capture_output=True, text=True, cwd=repo, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["sec"]


def main() -> None:
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    query = sys.argv[3] if len(sys.argv) > 3 else "q_tile_encode"
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    cores, cpuset = 8, "0-7"
    a_times, b_times = [], []
    for _ in range(reps):  # interleaved so tenant noise hits both sides
        a_times.append(run_once(dir_a, query, sf_dir, cores, cpuset))
        b_times.append(run_once(dir_b, query, sf_dir, cores, cpuset))
    best_a, best_b = min(a_times), min(b_times)
    print(json.dumps({
        "query": query, "sf_dir": sf_dir, "cores": cores, "reps": reps,
        "a_dir": dir_a, "b_dir": dir_b,
        "a_times": a_times, "b_times": b_times,
        "a_best": best_a, "b_best": best_b,
        "b_over_a": round(best_b / best_a, 3),
    }))


if __name__ == "__main__":
    main()
