"""Streaming deduplication: first occurrence wins, state bounded by the
watermark.

A continuously-ingested corpus re-delivers documents (retries, replayed
partitions, duplicate crawls); the batch ``operators/dedup.py`` passes
can't run until the data is at rest. This gives the streaming-native
exact pass:

- ``dedup_stream`` uses ``dropDuplicatesWithinWatermark`` — duplicate
  keys arriving within the watermark horizon are dropped and the key's
  state is EVICTED once the watermark passes it, so state is
  O(keys per horizon), not O(all keys ever) (plain ``dropDuplicates``
  on a stream grows state forever — the 100 TB failure mode).
- ``dedup_stream_by_content`` keys on md5 of a content column — the
  streaming twin of ``operators/dedup.exact_dedup``.

A duplicate arriving AFTER its original's state expired is re-emitted;
that is the documented horizon semantic (the batch pass downstream
sweeps anything beyond the horizon), verified in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup on ``key_cols`` with watermark-bounded state."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_by_content(
    stream: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-content dedup: md5 of ``content_col`` as the key
    (same fingerprint as the batch ``exact_dedup`` pass, so batch and
    streaming agree on what counts as a duplicate)."""
    keyed = stream.withColumn("_content_hash", F.md5(F.col(content_col)))
    return dedup_stream(
        keyed, ["_content_hash"], ts_col=ts_col, watermark=watermark
    ).drop("_content_hash")
