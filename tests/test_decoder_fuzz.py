"""Decoder robustness fuzz: corrupted tiles must fail CLEANLY.

A 100 TB ingest will see truncated objects and bit rot. The decoders
may reject corrupt input with any ordinary exception — what they must
never do is hang, crash the interpreter, or silently return data from a
TRUNCATED buffer (bit flips that decode to different-but-valid content
are indistinguishable from valid tiles by construction; truncation is
always detectable and must never round-trip quietly to the same feature
count with missing bytes)."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from cov_tiles_spark.covt.decoder import decode_covt
from cov_tiles_spark.covt.mvt import decode_mvt

GOLDEN = sorted(
    glob.glob("/root/reference/parser/js/data/*/*.covt")
)[:6]  # bounded corpus: fuzzing all 15 tiles x many offsets is slow


def _tiles():
    return [(p, open(p, "rb").read()) for p in GOLDEN]


@pytest.mark.parametrize("path,data", _tiles(), ids=lambda v: str(v)[-20:])
def test_truncation_never_silently_succeeds(path, data):
    if not isinstance(data, bytes):
        pytest.skip("param id pass")
    n_layers = len(decode_covt(data))
    rng = np.random.default_rng(1)
    cuts = sorted(set(rng.integers(1, len(data), 25).tolist()))
    for cut in cuts:
        try:
            layers = decode_covt(data[:cut])
        except Exception:
            continue  # clean rejection: fine
        # a prefix that decodes at all must not claim the full tile
        assert len(layers) < n_layers, f"{path}: silent success at cut={cut}"


@pytest.mark.parametrize("path,data", _tiles(), ids=lambda v: str(v)[-20:])
def test_bit_flips_fail_cleanly_or_decode(path, data):
    if not isinstance(data, bytes):
        pytest.skip("param id pass")
    rng = np.random.default_rng(2)
    for _ in range(25):
        pos = int(rng.integers(0, len(data)))
        bit = int(rng.integers(0, 8))
        mutated = bytearray(data)
        mutated[pos] ^= 1 << bit
        try:
            decode_covt(bytes(mutated))
        except Exception:
            pass  # any ordinary exception is a clean rejection


def test_mvt_reader_rejects_covt_and_truncations():
    covt = open(GOLDEN[0], "rb").read()
    with pytest.raises(Exception):
        decode_mvt(covt)
    mvts = sorted(glob.glob("/root/reference/parser/js/data/omt/*.mvt"))[:2]
    rng = np.random.default_rng(3)
    for p in mvts:
        data = open(p, "rb").read()
        for cut in rng.integers(1, len(data), 15).tolist():
            try:
                decode_mvt(data[: int(cut)])
            except Exception:
                pass  # clean rejection


def test_genb_bit_flips_fail_cleanly():
    from cov_tiles_spark.covt.genb import decode_tile_genb
    from cov_tiles_spark.pipeline.transcode import mvt_to_genb

    mvt = open("/root/reference/parser/js/data/omt/5_16_20.mvt", "rb").read()
    payload, tilejson, _, _ = mvt_to_genb(mvt)
    decode_tile_genb(payload, tilejson)  # sanity: valid tile decodes
    rng = np.random.default_rng(4)
    for _ in range(25):
        pos = int(rng.integers(0, len(payload)))
        mutated = bytearray(payload)
        mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_tile_genb(bytes(mutated), tilejson)
        except Exception:
            pass  # clean rejection
    for cut in rng.integers(1, len(payload), 20).tolist():
        try:
            decode_tile_genb(payload[: int(cut)], tilejson)
        except Exception:
            pass
