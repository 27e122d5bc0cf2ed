"""COVT gen-A metadata model.

Mirrors `/root/reference/parser/js/src/decoder/covtMetadata.ts` (enums and
layer/column/stream metadata) — values must match byte-for-byte since they
appear in the wire format.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class ColumnDataType(IntEnum):
    STRING = 0
    FLOAT = 1
    DOUBLE = 2
    INT_64 = 3
    UINT_64 = 4
    BOOLEAN = 5
    GEOMETRY = 6
    GEOMETRY_M = 7
    GEOMETRY_Z = 8
    GEOMETRY_ZM = 9


class ColumnEncoding(IntEnum):
    PLAIN = 0
    VARINT = 1
    DELTA_VARINT = 2
    RLE = 3
    BOOLEAN_RLE = 4
    BYTE_RLE = 5
    DICTIONARY = 6
    LOCALIZED_DICTIONARY = 7
    ORDERED_GEOMETRY_ENCODING = 8
    INDEXED_COORDINATE_ENCODING = 9


class GeometryType(IntEnum):
    """OGC SFA subset (`geometry.ts:1-8`)."""

    POINT = 0
    LINESTRING = 1
    POLYGON = 2
    MULTI_POINT = 3
    MULTI_LINESTRING = 4
    MULTI_POLYGON = 5


@dataclass
class StreamMetadata:
    num_values: int
    byte_length: int


@dataclass
class ColumnMetadata:
    name: str
    data_type: ColumnDataType
    encoding: ColumnEncoding
    streams: dict[str, StreamMetadata] = field(default_factory=dict)


@dataclass
class LayerMetadata:
    name: str
    num_features: int
    columns: list[ColumnMetadata] = field(default_factory=list)


ID_COLUMN = "id"
GEOMETRY_COLUMN = "geometry"
GEOMETRY_TYPES_STREAM = "geometry_types"
GEOMETRY_OFFSETS_STREAM = "geometry_offsets"
PART_OFFSETS_STREAM = "part_offsets"
RING_OFFSETS_STREAM = "ring_offsets"
VERTEX_OFFSETS_STREAM = "vertex_offsets"
VERTEX_BUFFER_STREAM = "vertex_buffer"
PRESENT_STREAM = "present"
DATA_STREAM = "data"
LENGTH_STREAM = "length"
DICTIONARY_STREAM = "dictionary"
