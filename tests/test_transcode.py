"""Distributed MVT→COVT transcoding over the reference's own golden .mvt
tiles — the reference's main program as a Spark job (SURVEY §3.1/§3.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cov_tiles_spark.pipeline.transcode import transcode_mvt_directory


def test_transcode_reference_omt_tiles(spark):
    result = transcode_mvt_directory(
        spark, "/root/reference/parser/js/data/omt"
    ).cache()
    rows = result.collect()
    assert len(rows) == 7  # z2..z8 OMT tiles
    for r in rows:
        assert r.verified, f"{r.path}: round-trip verification failed"
        assert r.z >= 2 and r.n_features > 0
        assert r.covt_bytes > 0

    # compression parity with the reference's own measurements
    # (README.md:21-35 reports 29-74% reduction vs uncompressed MVT; we
    # lack FastPFOR + localized dictionaries, so expect >= 20% average)
    agg = result.agg(
        (1 - F.sum("covt_bytes") / F.sum("mvt_bytes")).alias("reduction")
    ).collect()[0]
    assert agg.reduction >= 0.20, f"aggregate reduction only {agg.reduction:.2%}"


def test_transcode_bing_tiles(spark):
    result = transcode_mvt_directory(
        spark, "/root/reference/parser/js/data/bing"
    )
    rows = result.collect()
    assert len(rows) == 7
    assert all(r.verified for r in rows)
