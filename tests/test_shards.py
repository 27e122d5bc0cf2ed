"""WebDataset tar shard sink/source: roundtrip, determinism, wire shape."""

from __future__ import annotations

import glob
import hashlib
import io
import os
import tarfile
import tempfile

from pyspark.sql import functions as F

from cov_tiles_spark.io.synth import images_df
from cov_tiles_spark.sources.shards import read_webdataset, write_webdataset

N = 220


def _write(spark, tmp, target=96 * 1024):
    imgs = images_df(spark, N, partitions=6)
    manifest = write_webdataset(imgs, tmp, target_shard_bytes=target)
    return imgs, manifest


def test_webdataset_roundtrip_lossless(spark):
    with tempfile.TemporaryDirectory(prefix="wds_") as tmp:
        imgs, manifest = _write(spark, tmp)
        m = manifest.collect()
        assert sum(r.n_records for r in m) == N
        assert all(os.path.exists(r.path) for r in m)
        assert len(m) > 1  # target forces multiple shards

        back = read_webdataset(spark, tmp)
        a = (
            imgs.select(
                "image_id", F.md5("bytes").alias("payload_md5"),
                "w", "h", "fmt", "caption", "phash",
            )
            .orderBy("image_id")
            .collect()
        )
        b = (
            back.select(
                "image_id", F.md5("bytes").alias("payload_md5"),
                "w", "h", "fmt", "caption", "phash",
            )
            .orderBy("image_id")
            .collect()
        )
        assert a == b


def test_webdataset_shards_byte_identical_across_runs(spark):
    with tempfile.TemporaryDirectory(prefix="wds_a_") as ta, \
            tempfile.TemporaryDirectory(prefix="wds_b_") as tb:
        _write(spark, ta)
        _write(spark, tb)

        def digest(d):
            return {
                os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
                for p in glob.glob(os.path.join(d, "*.tar"))
            }

        da, db = digest(ta), digest(tb)
        assert da and da == db


def test_webdataset_tar_wire_shape(spark):
    """Public-convention member layout: {key}.{ext} / {key}.txt /
    {key}.json consecutive per sample, id-sorted, zeroed tar metadata."""
    with tempfile.TemporaryDirectory(prefix="wds_") as tmp:
        _write(spark, tmp)
        p = sorted(glob.glob(os.path.join(tmp, "*.tar")))[0]
        tf = tarfile.open(fileobj=io.BytesIO(open(p, "rb").read()))
        members = tf.getmembers()
        assert len(members) % 3 == 0
        stems = []
        for i in range(0, len(members), 3):
            trio = members[i : i + 3]
            stem = trio[0].name.rsplit(".", 1)[0]
            assert [m.name.rsplit(".", 1)[0] for m in trio] == [stem] * 3
            exts = {m.name.rsplit(".", 1)[1] for m in trio}
            assert "txt" in exts and "json" in exts
            stems.append(stem)
            for m in trio:
                assert m.mtime == 0 and m.uid == 0 and m.uname == ""
        assert stems == sorted(stems)


def test_webdataset_continuation_parts_when_bucket_exceeds_target(spark):
    """The size estimate excludes tar 512-padding, so buckets run a few
    percent over the byte target — the roll-over guard must split them
    into -partNNN continuation tars and the roundtrip stay lossless."""
    with tempfile.TemporaryDirectory(prefix="wds_") as tmp:
        imgs = images_df(spark, 60, partitions=2)
        manifest = write_webdataset(imgs, tmp, target_shard_bytes=16 * 1024)
        rows = manifest.collect()
        assert sum(r.n_records for r in rows) == 60
        assert any("-part" in r.path for r in rows)
        # every tar respects the target up to one record of slack plus
        # tarfile's end-of-archive padding to the 10240 B record size
        assert all(r.n_bytes <= 16 * 1024 + 8 * 1024 + 10240 for r in rows)
        assert read_webdataset(spark, tmp).count() == 60
