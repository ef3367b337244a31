"""Multimodal plumbing tests: schema, determinism, actor-pool stages, stub
gating of the real codec."""

from __future__ import annotations

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest

from canal_ray.ops.multimodal import (
    ImageFeatures,
    decode_fake_image,
    encode_fake_image,
    image_feature_pipeline,
    synthesize_media,
    thumbnail_pipeline,
)


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    return synthesize_media(str(d / "media.parquet"), n=100, seed=3)


def test_fake_codec_roundtrip():
    payload = encode_fake_image(42, 32, 16, 3)
    w, h, c, px = decode_fake_image(payload)
    assert (w, h, c) == (32, 16, 3)
    assert px.shape == (16, 32, 3)
    assert payload == encode_fake_image(42, 32, 16, 3)  # deterministic


def test_real_codec_is_gated():
    with pytest.raises(NotImplementedError):
        ImageFeatures(use_real_codec=True)


def test_feature_pipeline(ray_session, media):
    df = image_feature_pipeline(media)
    assert len(df) == 100
    assert list(df.columns) == ["media_id", "width", "height", "channels", "mean_luma", "std_luma"]
    # metadata in features must match metadata stored alongside payloads
    meta = pq.read_table(media).to_pandas()[["media_id", "width", "height"]]
    merged = df.merge(meta, on="media_id", suffixes=("", "_stored"))
    assert (merged["width"] == merged["width_stored"]).all()
    assert df["mean_luma"].between(100, 155).all()  # uniform bytes -> ~127.5
    # deterministic across runs
    df2 = image_feature_pipeline(media)
    pd.testing.assert_frame_equal(
        df.sort_values("media_id").reset_index(drop=True),
        df2.sort_values("media_id").reset_index(drop=True),
    )


def test_thumbnail_pipeline(ray_session, media, tmp_path):
    out = thumbnail_pipeline(media, str(tmp_path / "thumbs"))
    files = glob.glob(f"{out}/*.parquet")
    assert files
    t = pq.read_table(files[0])
    assert t.column_names == ["media_id", "thumbnail"]
    w, h, c, px = decode_fake_image(t["thumbnail"][0].as_py())
    assert (w, h) == (8, 8) and px.shape == (8, 8, c)


# ----------------------------------------------------- audio / video (r2)
def test_audio_codec_roundtrip_and_gating():
    from canal_ray.ops.multimodal import (
        AudioFeatures,
        decode_fake_audio,
        encode_fake_audio,
    )

    payload = encode_fake_audio(5, 1000, 8000)
    sr, x = decode_fake_audio(payload)
    assert sr == 8000 and len(x) == 1000
    assert payload == encode_fake_audio(5, 1000, 8000)
    with pytest.raises(NotImplementedError):
        AudioFeatures(use_real_codec=True)


def test_video_frame_extraction_matches_direct_slice():
    from canal_ray.ops.multimodal import (
        decode_fake_video_frame,
        encode_fake_video,
    )
    import numpy as np

    vid = encode_fake_video(9, 8, 6, 5)
    f2 = decode_fake_video_frame(vid, 2)
    w, h, c, px = decode_fake_image(f2)
    assert (w, h, c) == (8, 6, 3) and px.shape == (6, 8, 3)
    # deterministic: same frame twice, different frames differ
    assert decode_fake_video_frame(vid, 2) == f2
    assert decode_fake_video_frame(vid, 3) != f2
    with pytest.raises(IndexError):
        decode_fake_video_frame(vid, 5)


def test_av_pipelines_end_to_end(ray_session, tmp_path):
    from canal_ray.ops.multimodal import (
        audio_feature_pipeline,
        decode_fake_audio,
        synthesize_av_media,
        video_frame_features,
    )
    import numpy as np

    path = synthesize_av_media(str(tmp_path / "av.parquet"), n=32, seed=13)
    aud = audio_feature_pipeline(path)
    assert len(aud) == 16 and set(aud.columns) == {"media_id", "duration_s", "rms", "zcr"}
    # one spot oracle: direct decode matches the actor-pool stage
    t = pq.read_table(path, columns=["media_id", "kind", "payload"])
    i = t["kind"].to_pylist().index("audio")
    sr, x = decode_fake_audio(t["payload"][i].as_py())
    row = aud[aud["media_id"] == t["media_id"][i].as_py()].iloc[0]
    f = x.astype(np.float64)
    assert abs(row["rms"] - round(float(np.sqrt(np.mean(f * f))), 6)) < 1e-9

    vid = video_frame_features(path, every=4)
    assert len(vid) > 0
    # every video contributes ceil(n_frames / 4) frames
    from canal_ray.ops.multimodal import _VHEADER

    expected = 0
    for k, p in zip(t["kind"].to_pylist(), t["payload"].to_pylist()):
        if k == "video":
            n = _VHEADER.unpack_from(p)[4]
            expected += (n + 3) // 4
    assert len(vid) == expected
    assert (vid["frame_idx"] % 4 == 0).all()


def test_multimodal_query_entry(ray_session):
    from canal_ray.ops.multimodal import multimodal_media_features

    df = multimodal_media_features("/root/testdata/sf0.001")
    assert set(df["kind"]) == {"image", "audio", "video_frame"}
    assert len(df) > 256  # images + audio + sampled frames
