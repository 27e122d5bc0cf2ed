"""Audio/video multimodal operators (operators/av.py): codecs, features,
frame sampling, resize — plus the Spark plumbing over the deterministic
corpora (io/synth.py audio_df/video_df)."""

from __future__ import annotations

import numpy as np
import pytest

from cov_tiles_spark.operators.av import (
    decode_audio, decode_video, encode_audio, encode_video,
    resize_image, sample_frame_indices, synth_audio, synth_video,
)


def test_pcm16_roundtrip_lossless():
    s = synth_audio(3, 5000)
    assert np.array_equal(decode_audio(encode_audio(s, "pcm16"), "pcm16"), s)


def test_rawv_roundtrip_lossless():
    v = synth_video(5, 16, 12, 6)
    assert np.array_equal(decode_video(encode_video(v, "rawv"), 16, 12, 6, "rawv"), v)


def test_unknown_formats_raise_plug_point():
    with pytest.raises(NotImplementedError):
        decode_audio(b"", "mp3")
    with pytest.raises(NotImplementedError):
        decode_video(b"", 1, 1, 1, "mp4")


def test_audio_features_exact_on_known_signal(spark):
    """Alternating +/-1000 samples: zcr = n-1, energy = n * 10^6."""
    import pandas as pd
    from cov_tiles_spark.operators.av import audio_features

    n = 400
    s = np.where(np.arange(n) % 2 == 0, 1000, -1000).astype(np.int16)
    df = spark.createDataFrame(
        pd.DataFrame({"asset_id": ["a"], "bytes": [encode_audio(s, "pcm16")],
                      "fmt": ["pcm16"]})
    )
    row = audio_features(df).collect()[0]
    assert row.n_samples == n
    assert row.peak == 1000
    assert row.energy == n * 1_000_000
    assert row.zero_crossings == n - 1


def test_frame_sample_indices_rule():
    assert sample_frame_indices(10, 4) == [0, 2, 5, 7]
    assert sample_frame_indices(3, 4) == [0, 1, 2]  # k capped at n
    assert sample_frame_indices(8, 1) == [0]


def test_frame_sample_features_distributed(spark):
    from cov_tiles_spark.io.synth import video_df
    from cov_tiles_spark.operators.av import frame_sample_features
    from cov_tiles_spark.operators.images import phash64

    out = {
        r.asset_id: r
        for r in frame_sample_features(video_df(spark, 6), k=3).collect()
    }
    assert len(out) == 6
    # independent per-asset check for asset 2
    w, h, nf = 32, 24, 8 + (2 % 5) * 2
    frames = synth_video(2, w, h, nf)
    acc = 0
    for i in sample_frame_indices(nf, 3):
        acc ^= phash64(frames[i]) & ((1 << 64) - 1)
    if acc >= 1 << 63:
        acc -= 1 << 64
    assert out["vid-000000002"].frame_phash_xor == acc
    assert out["vid-000000002"].frames_sampled == 3


def test_resize_constant_image_stays_constant():
    px = np.full((30, 20, 3), 77, dtype=np.uint8)
    out = resize_image(px, 7, 9)
    assert out.shape == (9, 7, 3)
    assert np.all(out == 77)


def test_resize_area_mean_exact():
    """2x downscale of a checkerboard of 0/255 averages to 127 (exact
    integer floor of (0+255+0+255)/4)."""
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[::2, 1::2] = 255
    px[1::2, ::2] = 255
    out = resize_image(px, 2, 2)
    assert np.all(out == 127)


def test_resize_images_distributed_roundtrip(spark):
    from cov_tiles_spark.io.synth import images_df
    from cov_tiles_spark.operators.av import resize_images
    from cov_tiles_spark.operators.images import decode_image

    imgs = images_df(spark, 12)
    small = resize_images(imgs, 8, 8)
    rows = small.collect()
    assert len(rows) == 12
    for r in rows:
        px = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        assert px.shape == (8, 8, 3)
