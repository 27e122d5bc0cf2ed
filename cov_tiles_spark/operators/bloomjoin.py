"""Bloom-filter semi-join pruning: shrink the BIG side of a join before
it shuffles.

At 100 TB the dominant join cost is shuffling the fact side; when the
join is selective (most fact rows match nothing), a Bloom filter built
from the small side and broadcast as a bitmap lets every fact partition
drop non-matching rows *map-side*, before the exchange. Spark's own
runtime row-group filtering covers some of this for parquet scans; this
operator makes the pattern explicit, engine-portable, and usable on any
DataFrame (including mid-pipeline ones no scan-level filter can reach).

Correctness is unconditional: a Bloom filter has false positives but no
false negatives, and the survivors still go through the exact semi-join,
so the result equals the plain semi-join row-for-row (the DuckDB twin in
the driver gate is literally `WHERE key IN (...)`).

Portability: bit positions come from the engine-portable integer hash in
``operators/sampling.py`` (plain column arithmetic, whole-stage codegen)
— the only Python in the plan is the Arrow-batched membership gather
against the broadcast bitmap (one numpy fancy-index per hash, per
batch).

Scale shape: the build side is hash-repartitioned to a bounded number of
partitions, each emits one packed partial bitmap (num_bits/8 bytes), and
the driver ORs those partials — collect volume is
``merge_parallelism * num_bits/8`` regardless of build-side row count.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cov_tiles_spark.operators.sampling import sample_hash

_MAX_BITS = 1 << 28  # 32 MiB bitmap ceiling


def _positions(key: F.Column, num_bits: int, num_hashes: int) -> list[F.Column]:
    """k engine-portable bit positions for a bigint key."""
    return [
        sample_hash(key, seed=1_000 + i) % num_bits for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
    merge_parallelism: int = 64,
) -> bytes:
    """Packed little-endian bitmap with every key's k bits set."""
    pos = df.select(
        F.explode(
            F.array(*_positions(F.col(key_col), num_bits, num_hashes))
        ).alias("p")
    )
    n_bytes = (num_bits + 7) // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            p = pdf["p"].to_numpy(np.int64)
            seen = True
            # bincount over byte index then threshold would lose the
            # per-bit lane; set bits via |= on the unique positions
            np.bitwise_or.at(bits, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = (
        pos.repartition(merge_parallelism, "p")
        .mapInPandas(partial, schema="bitmap binary")
        .collect()
    )
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes()


def bloom_filter_rows(
    df: DataFrame,
    key_col: str,
    bloom: bytes,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Keep rows whose key *may* be in the filter (no false negatives)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.frombuffer(bloom, dtype=np.uint8))
    pos_cols = _positions(F.col(key_col), num_bits, num_hashes)
    staged = df.withColumn("_bpos", F.array(*pos_cols))

    @F.pandas_udf("boolean")
    def member(pos: pd.Series) -> pd.Series:
        bits = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        arr = np.stack(pos.to_numpy())  # (rows, k)
        ok = np.ones(len(arr), dtype=bool)
        for j in range(arr.shape[1]):
            p = arr[:, j]
            ok &= (bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1 == 1
        return pd.Series(ok)

    return staged.filter(member(F.col("_bpos"))).drop("_bpos")


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    bits_per_key: int = 10,
    num_hashes: int | None = None,
    merge_parallelism: int = 64,
) -> DataFrame:
    """Exact ``big SEMI JOIN small ON key`` with map-side Bloom pruning.

    ``bits_per_key=10`` gives ~1% false positives with k=7 hashes — the
    exchange then carries ~(selectivity + 1%) of the big side instead of
    all of it; the trailing exact semi-join removes the false positives,
    so the output is exactly the plain semi-join's.
    """
    n = small.select(key).distinct().count()
    num_bits = 1 << max(14, math.ceil(math.log2(max(n, 1) * bits_per_key)))
    num_bits = min(num_bits, _MAX_BITS)
    if num_hashes is None:
        num_hashes = max(1, min(8, round(0.693 * num_bits / max(n, 1))))
    bloom = build_bloom(
        small, key, num_bits, num_hashes, merge_parallelism=merge_parallelism
    )
    pruned = bloom_filter_rows(big, key, bloom, num_bits, num_hashes)
    return pruned.join(small.select(key).distinct(), key, "left_semi")
