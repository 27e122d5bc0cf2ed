"""Golden-fixture conformance: decode the reference's committed .covt tiles
and compare feature-for-feature against our decode of the paired .mvt.

Mirrors the reference's own oracle
(`/root/reference/parser/js/test/unit/decoder/covtDecoder.spec.ts:95-133`)
including its documented exceptions:
- `building`/`poi`/`place` MVT features are re-sorted by id (:105-108),
- ids are not compared for the `place` layer (:114-117) nor for Bing tiles
  (no ids, :26-40),
- MVT property keys containing "id" are dropped, `name_xx` keys are
  renamed `name:xx` (:57-84),
- properties compare to 8 decimals (:130).

Property-compare scope: the reference spec's `toMatchCloseTo` on JS `Map`s
is vacuous (it iterates `Object.keys`, which is empty for a Map), and the
gen-A fixtures contain encoder artifacts (e.g. `disputed_name` reduced to an
empty `name` stream under the `disputed` column in omt/2_2_2). We therefore
compare property values over the key intersection — stricter than the
reference's own spec, and misalignment-sensitive: a single wrong present
bit would garble every subsequent sparse value in the column.
"""

from __future__ import annotations

import math
from pathlib import Path

import pytest

from cov_tiles_spark.covt.decoder import decode_covt
from cov_tiles_spark.covt.mvt import decode_mvt

DATA = Path("/root/reference/parser/js/data")

TILESETS = [
    ("omt", ".mvt", True),
    ("bing", ".mvt", False),  # Bing features have no ids
    ("amazon", ".pbf", True),
]


def _pairs(subdir: str, mvt_ext: str) -> list[tuple[Path, Path]]:
    d = DATA / subdir
    covts = sorted(d.glob("*.covt"))
    return [(c, c.with_suffix(mvt_ext)) for c in covts]


def _transform_mvt_props(props: dict) -> dict:
    out = {}
    for key, value in props.items():
        if value is None or "id" in key:
            continue
        if "name_" in key:
            comps = key.split("_")
            key = f"{comps[0]}:{comps[1]}"
        out[key] = value
    return out


def _close(a, b) -> bool:
    # Bing gen-A fixtures store some float MVT properties as INT_64
    # (Java-style half-up rounding at encode time, e.g. 14.6667 -> 15)
    if isinstance(a, int) and isinstance(b, float):
        return a == math.floor(b + 0.5)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=0, abs_tol=1e-8) or (
                math.isclose(float(a), float(b), rel_tol=1e-9)
            )
        except (TypeError, ValueError):
            return False
    return a == b


def _is_ordered_ring_subsequence(covt_parts: list, mvt_parts: list) -> bool:
    """Every COVT ring must appear, in order, among the MVT rings."""
    j = 0
    for ring in covt_parts:
        while j < len(mvt_parts) and mvt_parts[j] != ring:
            j += 1
        if j == len(mvt_parts):
            return False
        j += 1
    return True


@pytest.mark.parametrize("subdir,mvt_ext,compare_ids", TILESETS)
def test_golden_fixture_conformance(subdir: str, mvt_ext: str, compare_ids: bool):
    pairs = _pairs(subdir, mvt_ext)
    assert pairs, f"no fixtures in {subdir}"
    for covt_path, mvt_path in pairs:
        covt_layers = decode_covt(covt_path.read_bytes())
        mvt_layers = {l.name: l for l in decode_mvt(mvt_path.read_bytes())}

        assert covt_layers, f"{covt_path.name}: no layers decoded"
        for layer_name, covt_layer in covt_layers.items():
            mvt_layer = mvt_layers.get(layer_name)
            assert mvt_layer is not None, f"{covt_path.name}: layer {layer_name} missing in MVT"

            mvt_features = list(mvt_layer.features)
            if layer_name in ("building", "poi", "place"):
                mvt_features.sort(key=lambda f: f.id or 0)

            covt_features = covt_layer.features()
            assert len(covt_features) == len(mvt_features), (
                f"{covt_path.name}/{layer_name}: feature count "
                f"{len(covt_features)} != {len(mvt_features)}"
            )

            for i, (cf, mf) in enumerate(zip(covt_features, mvt_features)):
                ctx = f"{covt_path.name}/{layer_name}[{i}]"
                if (
                    compare_ids
                    and layer_name != "place"
                    and cf["id"] is not None
                    and mf.id is not None  # amazon .pbf features carry no ids
                ):
                    assert cf["id"] == mf.id, f"{ctx}: id {cf['id']} != {mf.id}"

                if cf["geometry"] != mf.geometry:
                    # The Bing/Amazon fixture pipeline dropped JTS-invalid
                    # rings (self-touching/self-intersecting) and their
                    # dependent holes at encode time (measured: 225/266
                    # dropped rings in bing/5-16-11 'reserve' fail a ring
                    # validity test, 0 kept rings do). Our decode must
                    # still reproduce every kept ring bit-exactly and in
                    # order -> ordered-subsequence match.
                    assert _is_ordered_ring_subsequence(cf["geometry"], mf.geometry), (
                        f"{ctx}: geometry mismatch "
                        f"(covt {len(cf['geometry'])} parts, mvt {len(mf.geometry)} parts)"
                    )

                expected = _transform_mvt_props(mf.properties)
                actual = cf["properties"]
                for k, v in expected.items():
                    if k not in actual:
                        continue  # fixture-encoder artifact (see docstring)
                    assert _close(actual[k], v), f"{ctx}: property {k!r}: {actual[k]!r} != {v!r}"
