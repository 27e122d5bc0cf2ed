"""IcebergLite table maintenance: small-file compaction + snapshot
version expiry (the storage-ops half of the 100 TB lake story)."""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.pipeline.lineage import IcebergLite


@pytest.fixture()
def lake(spark, tmp_path):
    return IcebergLite(spark, str(tmp_path / "lake"))


def _fragmented_table(spark, lake, n=400, buckets=4, tasks=8):
    """Commit a table whose every partition carries ``tasks`` small
    files (one per writing task). mode="overwrite" bypasses the resume
    anti-join, whose empty-manifest plan AQE collapses to ONE task in
    tiny test corpora (at scale the join keeps shuffle-width output and
    fragmentation is the norm — exactly what compaction exists for)."""
    df = (
        spark.range(n)
        .repartition(tasks)  # each task holds rows of every bucket
        .select(
            F.col("id"),
            (F.col("id") * 17 % 1000).alias("v"),
            (F.col("id") % buckets).cast("string").alias("bucket"),
        )
    )
    lake.commit_partitions("t", "load", df, "bucket", mode="overwrite")
    return df


def _files_per_partition(lake, table="t"):
    base = f"{lake.root}/{table}"
    out = {}
    for sd in os.listdir(base):
        for pd_ in os.listdir(f"{base}/{sd}"):
            if "=" not in pd_:
                continue
            k = pd_.split("=", 1)[1]
            n = len(glob.glob(f"{base}/{sd}/{pd_}/part-*.parquet"))
            out.setdefault(k, []).append((sd, n))
    return out


def test_compaction_reduces_files_and_verifies_checksums(spark, lake):
    _fragmented_table(spark, lake)
    before = lake.read_table("t", latest_only=True)
    rows_before = sorted((r.id, r.v, r.bucket) for r in before.collect())
    assert any(
        n > 1 for vs in _files_per_partition(lake).values() for _, n in vs
    )

    stats = lake.compact_partitions("t", "compact")
    assert stats["partitions_compacted"] == 4
    assert stats["checksums_verified"] == 4

    # latest-wins rows identical, and the winning version is 1-file
    after = lake.read_table("t", latest_only=True)
    assert sorted((r.id, r.v, r.bucket) for r in after.collect()) == rows_before
    newest = {}
    m = lake.manifests().filter(F.col("table") == "t").collect()
    for r in m:
        cur = newest.get(r.partition_key)
        if cur is None or r.committed_at_ns > cur.committed_at_ns:
            newest[r.partition_key] = r
    fpp = _files_per_partition(lake)
    for k, winner in newest.items():
        n_files = dict(fpp[k])[f"snapshot_id={winner.snapshot_id}"]
        assert n_files == 1, (k, fpp[k])


def test_compaction_noop_when_already_compact(spark, lake):
    df = spark.range(50).coalesce(1).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("bucket")
    )
    lake.commit_partitions("t", "load", df, "bucket")
    assert lake.compact_partitions("t", "compact") == {
        "partitions_compacted": 0,
        "checksums_verified": 0,
    }


def test_expire_reclaims_superseded_versions_only(spark, lake):
    _fragmented_table(spark, lake)
    t_before_compact = time.time_ns()
    lake.compact_partitions("t", "compact")

    # the pre-compaction version is still time-travelable
    old_view = lake.read_table("t", as_of_ns=t_before_compact)
    assert old_view.count() == 400

    latest_rows = sorted(
        (r.id, r.v, r.bucket)
        for r in lake.read_table("t", latest_only=True).collect()
    )
    stats = lake.expire_snapshots("t", older_than_ns=time.time_ns())
    assert stats["versions_expired"] == 4
    assert stats["dirs_removed"] == 4
    assert stats["bytes_reclaimed"] > 0

    # latest reads byte-for-byte unchanged
    after = sorted(
        (r.id, r.v, r.bucket)
        for r in lake.read_table("t", latest_only=True).collect()
    )
    assert after == latest_rows
    # the expired version is gone from time travel (the reclaim contract)
    with pytest.raises(Exception):
        lake.read_table("t", as_of_ns=t_before_compact).collect()


def test_expire_keeps_tombstone_winners(spark, lake):
    df = spark.range(60).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("bucket")
    )
    lake.commit_partitions("t", "load", df, "bucket")
    dead = spark.createDataFrame([("1",)], "partition_key string")
    lake.commit_tombstones("t", "del", dead)
    stats = lake.expire_snapshots("t", older_than_ns=time.time_ns())
    # the tombstoned key's data version is superseded -> expired; the
    # tombstone itself is the winner and must survive
    assert stats["versions_expired"] == 1
    latest = lake.read_table("t", latest_only=True)
    assert latest.filter(F.col("bucket") == "1").count() == 0
    assert latest.count() == 40


def test_expire_respects_horizon(spark, lake):
    _fragmented_table(spark, lake)
    horizon = time.time_ns()
    time.sleep(0.01)
    lake.compact_partitions("t", "compact")
    # the originals predate the horizon and are superseded -> they expire
    stats = lake.expire_snapshots("t", older_than_ns=horizon)
    assert stats["versions_expired"] == 4

    # the compacted versions are superseded by a reload but are NEWER
    # than this horizon -> retained (still time-travelable)
    h_before_compact = horizon  # compaction committed after this instant
    df2 = spark.range(400).repartition(6).select(
        F.col("id"), (F.col("id") * 13 % 100).alias("v"),
        (F.col("id") % 4).cast("string").alias("bucket"),
    )
    lake.commit_partitions("t", "reload", df2, "bucket", mode="overwrite")
    stats2 = lake.expire_snapshots("t", older_than_ns=h_before_compact)
    assert stats2["versions_expired"] == 0
