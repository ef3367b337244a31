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
