"""Measure the opt-in pre-encode generalization pass on the golden tiles.

For each committed golden MVT and each tolerance, runs
decode -> simplify_mvt_layers(tol) -> re-encode (gen-B, argmin defaults)
and reports line-vertex reduction and gen-B payload reduction vs the
tol=0 re-encode of the same tile. Strict per-part kernel equality is
pinned by tests/test_generalize.py::TestSimplifyMvtLayers; this script
is the sizing evidence for BENCH/BASELINE.md.

Usage: python scripts/generalize_report.py [tol ...]   (default 2 4 8)
"""

from __future__ import annotations

import glob
import os
import sys

from cov_tiles_spark.covt.mvt import decode_mvt, encode_mvt_layers as rebytes
from cov_tiles_spark.pipeline.transcode import mvt_to_genb
from cov_tiles_spark.spatial.generalize import simplify_mvt_layers

GOLDEN = sorted(
    glob.glob("/root/reference/parser/js/data/omt/*.mvt")
    + glob.glob("/root/reference/parser/js/data/bing/*.mvt")
)


def main() -> None:
    rings = "--rings" in sys.argv
    tols = [int(t) for t in sys.argv[1:] if t.isdigit()] or [2, 4, 8]
    suffix = " (rings)" if rings else ""
    print(f"| tile | base gen-B B | " +
          " | ".join(f"tol={t}{suffix} verts / bytes" for t in tols) + " |")
    print("|---|---|" + "---|" * len(tols))
    for path in GOLDEN:
        name = "/".join(path.split(os.sep)[-2:]).replace(".mvt", "")
        layers = decode_mvt(open(path, "rb").read())
        base = len(mvt_to_genb(rebytes(layers))[0])
        cells = []
        for tol in tols:
            slim, stats = simplify_mvt_layers(layers, tol, rings=rings)
            vin, vout = stats["vertices_in"], stats["vertices_out"]
            sz = len(mvt_to_genb(rebytes(slim))[0])
            vred = 100.0 * (1 - vout / vin) if vin else 0.0
            bred = 100.0 * (1 - sz / base)
            drop = stats["features_dropped"]
            cells.append(f"-{vred:.1f}% / -{bred:.1f}%"
                         + (f" ({drop} dropped)" if drop else ""))
        print(f"| {name} | {base} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
