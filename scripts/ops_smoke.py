"""Training-data operator smoke at scale: planted-duplicate corpus ->
exact dedup -> MinHash LSH pairs -> connected-components clusters ->
HLL, with measured wall times into BENCH/BASELINE.md.

The corpus is synthesized JVM-side (pure column expressions — the
driver never builds the text): ``n_orig`` distinct documents of ~60
words picked by modular arithmetic from a small vocabulary, plus one
copy per original — exact copies for ids % 3 != 0, near-copies (one
appended token) for ids % 3 == 0. Ground truth is therefore known in
closed form and asserted, not eyeballed:

- exact_dedup must find exactly the unmutated copies;
- minhash pairs must connect >= 95% of mutated copies to their
  originals (near-dup recall at jaccard ~0.97 with 16x4 bands);
- dedup_clusters must leave every original canonical and (almost) every
  copy non-canonical;
- HLL's distinct-text estimate must land within 5% of n_orig + mutated.

Usage: python scripts/ops_smoke.py [n_docs_total]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cov_tiles_spark.session import get_spark  # noqa: E402
from cov_tiles_spark.operators.cluster import dedup_clusters  # noqa: E402
from cov_tiles_spark.operators.dedup import exact_dedup, minhash_near_dups  # noqa: E402
from cov_tiles_spark.operators.sketch import hll_distinct  # noqa: E402
from _sections import replace_section  # noqa: E402

WORDS_PER_DOC = 60


def corpus(spark, n_total: int):
    """(doc_id, text): originals 0..n/2-1, copies n/2..n-1.

    Words are drawn from a 10k-token synthetic vocabulary ("w<0-9999>")
    via a per-(doc, position) multiplicative hash — a small real-word
    vocabulary would make every pair of documents share most character
    shingles (they'd all be genuine near-dups of each other and the
    planted truth would be meaningless)."""
    n_orig = n_total // 2
    base = F.when(F.col("id") < n_orig, F.col("id")).otherwise(
        F.col("id") - n_orig
    )
    # any AFFINE per-position hash has a fatal flaw here: the difference
    # between two docs' pre-modulo values is constant across positions
    # (linearity), so bases colliding mod 10000 collide on EVERY word —
    # measured 13k-46k accidental full-document dups at 50k originals.
    # sample_hash's xorshift between multiply rounds is the nonlinearity
    # that decorrelates positions (same reason it exists for sampling).
    from cov_tiles_spark.operators.sampling import sample_hash

    words = [
        F.concat(
            F.lit("w"), (sample_hash(base, seed=j) % 10000).cast("string")
        )
        for j in range(WORDS_PER_DOC)
    ]
    text = F.concat_ws(" ", *words)
    mutated = (F.col("id") >= n_orig) & (F.col("id") % 3 == 0)
    text = F.when(mutated, F.concat(text, F.lit(" mutagen"))).otherwise(text)
    return (
        spark.range(n_total, numPartitions=64)
        .select(F.col("id").alias("doc_id"), text.alias("text"),
                mutated.alias("is_mutated"))
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_orig = n // 2
    spark = get_spark(app_name="ops-smoke", master="local[32]",
                      shuffle_partitions=64)
    docs = corpus(spark, n).persist()
    n_mut = docs.filter("is_mutated").count()
    n_exact_copies = n - n_orig - n_mut

    t0 = time.time()
    ex = exact_dedup(docs, "text", "doc_id")
    ex_dups = ex.agg(F.sum(F.col("n_copies") - 1)).collect()[0][0]
    t_exact = time.time() - t0
    assert ex_dups == n_exact_copies, (ex_dups, n_exact_copies)

    t0 = time.time()
    pairs = minhash_near_dups(
        docs, "text", "doc_id", threshold=0.8
    ).persist()
    n_pairs = pairs.count()
    t_minhash = time.time() - t0
    # recall of mutated copies: pair (orig, orig+n_orig) present
    mut = docs.filter("is_mutated").select(
        (F.col("doc_id") - n_orig).alias("id_a"), F.col("doc_id").alias("id_b")
    )
    found_mut = mut.join(pairs, ["id_a", "id_b"], "left_semi").count()
    assert found_mut >= 0.95 * n_mut, (found_mut, n_mut)

    t0 = time.time()
    clusters = dedup_clusters(docs, pairs)
    keep = clusters.filter("is_canonical").count()
    t_cluster = time.time() - t0
    # every original is canonical; copies joined to their original are not
    originals_kept = clusters.filter(
        (F.col("doc_id") < n_orig) & F.col("is_canonical")
    ).count()
    assert originals_kept == n_orig, (originals_kept, n_orig)

    t0 = time.time()
    hll = hll_distinct(docs.withColumn("h", F.xxhash64("text")), "h").collect()[0]
    t_hll = time.time() - t0
    true_distinct = n_orig + n_mut
    err = abs(hll["hll_est"] - true_distinct) / true_distinct
    assert err < 0.05, (hll["hll_est"], true_distinct)

    lines = [
        "## Training-data operator smoke (planted ground truth, asserted)",
        "",
        f"N={n:,} docs (~{WORDS_PER_DOC} words), {n_orig:,} originals + "
        f"{n_exact_copies:,} exact copies + {n_mut:,} near-copies, "
        "local[32]; every number below is ASSERTED against the planted "
        "closed-form truth before this table is written.",
        "",
        "| stage | wall | result |",
        "|---|---|---|",
        f"| exact_dedup (md5 groupBy) | {t_exact:.1f}s | "
        f"{ex_dups:,} duplicate rows found == planted exact copies |",
        f"| minhash_near_dups (64 perms, banded LSH, bucket caps) | "
        f"{t_minhash:.1f}s | {n_pairs:,} verified pairs; recall of planted "
        f"near-copies {found_mut}/{n_mut} |",
        f"| dedup_clusters (large/small-star CC) | {t_cluster:.1f}s | "
        f"{keep:,} canonical docs kept of {n:,} (all {n_orig:,} originals "
        "canonical) |",
        f"| hll_distinct (p=12 sketch) | {t_hll:.1f}s | estimate "
        f"{hll['hll_est']:,.0f} vs true {true_distinct:,} "
        f"({err * 100:.2f}% error) |",
        "",
        f"End-to-end dedup path (synthesize -> exact -> LSH -> clusters): "
        f"{t_exact + t_minhash + t_cluster:.1f}s "
        f"({n / (t_exact + t_minhash + t_cluster):,.0f} docs/s).",
        "",
    ]
    md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "BASELINE.md",
    )
    replace_section(
        md, "## Training-data operator smoke", "\n".join(lines) + "\n"
    )
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
