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
    from canal_ray.ops.multimodal import decode_image

    out = thumbnail_pipeline(media, str(tmp_path / "thumbs"))
    files = glob.glob(f"{out}/*.parquet")
    assert files
    t = pq.read_table(files[0])
    assert t.column_names == ["media_id", "thumbnail"]
    payload = t["thumbnail"][0].as_py()
    assert payload[:2] == b"P6"  # 3-channel thumbnails are REAL binary PPM
    w, h, c, px = decode_image(payload)
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


# ------------------------------------------------ real stdlib codecs (r5)
def test_ppm_golden_and_roundtrip():
    """decode_ppm parses REAL netpbm P6 bytes (with a comment line), and
    encode->decode roundtrips exactly."""
    import numpy as np

    from canal_ray.ops.multimodal import decode_ppm, encode_ppm

    golden = b"P6\n# test image\n2 1\n255\n" + b"\xff\x00\x00\x00\xff\x00"
    w, h, c, px = decode_ppm(golden)
    assert (w, h, c) == (2, 1, 3)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]]]

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    w, h, c, out = decode_ppm(encode_ppm(img))
    assert (w, h) == (7, 5) and (out == img).all()


def test_bmp_golden_and_roundtrip():
    """decode_bmp parses a hand-assembled REAL 24bpp BI_RGB BMP byte string
    (bottom-up BGR, 4-byte row padding), and encode->decode roundtrips for
    odd widths where padding is non-zero."""
    import numpy as np

    from canal_ray.ops.multimodal import decode_bmp, encode_bmp

    golden = bytes.fromhex(
        "424d3e000000000000003600000028000000020000000100000001001800"
        "0000000008000000130b0000130b00000000000000000000"
        "0000ff00ff000000"
    )
    w, h, c, px = decode_bmp(golden)
    assert (w, h, c) == (2, 1, 3)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]]]

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)  # w=3 -> pad=3
    w, h, c, out = decode_bmp(encode_bmp(img))
    assert (w, h) == (3, 4) and (out == img).all()


def test_wav_real_bytes_and_stereo_downmix():
    """decode_wav reads RIFF/WAVE bytes written directly by the stdlib wave
    module (not our encoder), and downmixes stereo by mean."""
    import io
    import wave

    import numpy as np

    from canal_ray.ops.multimodal import decode_audio, decode_wav, encode_wav

    samples = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(22_050)
        f.writeframes(samples.tobytes())
    sr, x = decode_audio(buf.getvalue())  # via the magic-sniffing dispatcher
    assert sr == 22_050 and (x == samples).all()

    # roundtrip through our encoder
    sr, x = decode_wav(encode_wav(samples, 8_000))
    assert sr == 8_000 and (x == samples).all()

    # stereo downmix
    stereo = np.array([[100, 300], [-200, 0]], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(16_000)
        f.writeframes(stereo.tobytes())
    sr, x = decode_wav(buf.getvalue())
    assert x.tolist() == [200, -100]


def test_dispatchers_gate_unknown_formats():
    from canal_ray.ops.multimodal import decode_audio, decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04" + b"\x00" * 32)


def test_mixed_format_image_pipeline(ray_session, tmp_path):
    """The ONE actor pool decodes a column mixing FAKEIMG + real PPM + real
    BMP rows; features equal a direct in-process decode per format."""
    import numpy as np

    from canal_ray.ops.multimodal import decode_image

    path = synthesize_media(str(tmp_path / "mixed.parquet"), n=30, seed=21)
    t = pq.read_table(path, columns=["media_id", "payload"])
    payloads = t["payload"].to_pylist()
    # the synthesizer interleaves formats: 0=FAKEIMG, 1=PPM, 2=BMP
    assert payloads[0][:8] == b"FAKEIMG1"
    assert payloads[1][:2] == b"P6"
    assert payloads[2][:2] == b"BM"

    df = image_feature_pipeline(path).set_index("media_id")
    for i in (0, 1, 2, 28, 29):
        w, h, c, px = decode_image(payloads[i])
        row = df.loc[t["media_id"][i].as_py()]
        assert int(row["width"]) == w and int(row["height"]) == h
        assert abs(row["mean_luma"] - round(float(px.astype(np.float64).mean()), 6)) < 1e-9


def test_wav_rows_flow_through_audio_pipeline(ray_session, tmp_path):
    from canal_ray.ops.multimodal import (
        audio_feature_pipeline,
        decode_audio,
        synthesize_av_media,
    )
    import numpy as np

    path = synthesize_av_media(str(tmp_path / "av.parquet"), n=16, seed=31)
    t = pq.read_table(path, columns=["media_id", "kind", "payload"])
    payloads = t["payload"].to_pylist()
    assert payloads[2][:4] == b"RIFF"  # i%4==2 rows are real WAV bytes
    aud = audio_feature_pipeline(path).set_index("media_id")
    sr, x = decode_audio(payloads[2])
    f = x.astype(np.float64)
    row = aud.loc[t["media_id"][2].as_py()]
    assert abs(row["duration_s"] - round(len(x) / sr, 6)) < 1e-9
    assert abs(row["rms"] - round(float(np.sqrt(np.mean(f * f))), 6)) < 1e-9
