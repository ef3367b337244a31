"""Multimodal (image/audio/video) column plumbing — real Ray, stubbed codecs.

Media are opaque ``binary`` columns with typed metadata, processed by
actor-pool ``map_batches`` stages with small batch sizes (wide binary rows:
batch_size x concurrency must fit worker heaps — the block-size discipline of
SURVEY.md §7.5 "wide rows").

The container has no image/audio libraries, so the codec layer is explicitly
stubbed: real decode raises ``NotImplementedError`` unless PIL/soundfile are
importable, and a clearly-marked deterministic FAKE codec (a tiny header +
seeded pseudo-pixels) exercises the full Ray-side plumbing — schema, actor
signature, batch sizing, output layout — which is what the engine owns.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_MAGIC = b"FAKEIMG1"
_HEADER = struct.Struct(">8sHHB")  # magic, width, height, channels


def encode_fake_image(seed: int, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic fake image payload (header + seeded pseudo-pixels)."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return _HEADER.pack(_MAGIC, width, height, channels) + pixels.tobytes()


def decode_fake_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    magic, w, h, c = _HEADER.unpack_from(payload)
    if magic != _MAGIC:
        raise ValueError("not a FAKEIMG payload")
    px = np.frombuffer(payload, dtype=np.uint8, offset=_HEADER.size)
    return w, h, c, px.reshape(h, w, c)


def synthesize_media(out_path: str, n: int = 256, seed: int = 99) -> str:
    """Write a media.parquet of fake image payloads with typed metadata."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "width": w,
                "height": h,
                "payload": encode_fake_image(seed * 1_000_003 + i, w, h),
            }
        )
    tbl = pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], type=pa.int64()),
            "kind": pa.array([r["kind"] for r in rows], type=pa.string()),
            "width": pa.array([r["width"] for r in rows], type=pa.int32()),
            "height": pa.array([r["height"] for r in rows], type=pa.int32()),
            "payload": pa.array([r["payload"] for r in rows], type=pa.binary()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, out_path)
    return out_path


class ImageFeatures:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` (once per actor) probes for a real codec; ``__call__`` (per
    batch) decodes and emits per-image features. With no real codec present,
    the deterministic fake codec runs — the Ray-side contract is identical.
    """

    def __init__(self, use_real_codec: bool = False):
        self.real = None
        if use_real_codec:
            try:
                import PIL.Image  # noqa: F401  (absent in this container)

                self.real = PIL.Image
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode requires PIL, which is not installed; "
                    "use the deterministic fake codec (use_real_codec=False)"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, chans, means, stds = [], [], [], [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, px = decode_fake_image(payload)
            ids.append(media_id)
            widths.append(w)
            heights.append(h)
            chans.append(c)
            f = px.astype(np.float64)
            means.append(float(f.mean()))
            stds.append(float(f.std()))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "channels": pa.array(chans, type=pa.int32()),
                "mean_luma": pa.array(np.round(means, 6), type=pa.float64()),
                "std_luma": pa.array(np.round(stds, 6), type=pa.float64()),
            }
        )


class Thumbnailer:
    """Actor-pool resize stage (stride subsampling as the stub 'resize')."""

    def __init__(self, out_size: int = 8):
        self.out = out_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs = [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, px = decode_fake_image(payload)
            ys = np.linspace(0, h - 1, self.out).astype(int)
            xs = np.linspace(0, w - 1, self.out).astype(int)
            thumb = px[np.ix_(ys, xs)].tobytes()
            ids.append(media_id)
            thumbs.append(_HEADER.pack(_MAGIC, self.out, self.out, c) + thumb)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "thumbnail": pa.array(thumbs, type=pa.binary()),
            }
        )


_AMAGIC = b"FAKEAUD1"
_AHEADER = struct.Struct(">8sIH")  # magic, n_samples, sample_rate


def encode_fake_audio(seed: int, n_samples: int, sample_rate: int = 16_000) -> bytes:
    """Deterministic fake audio payload (header + seeded int16 samples)."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(1 << 14), 1 << 14, size=n_samples, dtype=np.int16)
    return _AHEADER.pack(_AMAGIC, n_samples, sample_rate) + samples.astype("<i2").tobytes()


def decode_fake_audio(payload: bytes) -> tuple[int, np.ndarray]:
    magic, n, sr = _AHEADER.unpack_from(payload)
    if magic != _AMAGIC:
        raise ValueError("not a FAKEAUD payload")
    return sr, np.frombuffer(payload, dtype="<i2", offset=_AHEADER.size)[:n]


_VMAGIC = b"FAKEVID1"
_VHEADER = struct.Struct(">8sHHBH")  # magic, width, height, channels, n_frames


def encode_fake_video(
    seed: int, width: int, height: int, n_frames: int, channels: int = 3
) -> bytes:
    """Deterministic fake video: header + n_frames planes of seeded pixels."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(
        0, 256, size=n_frames * width * height * channels, dtype=np.uint8
    )
    return _VHEADER.pack(_VMAGIC, width, height, channels, n_frames) + frames.tobytes()


def decode_fake_video_frame(payload: bytes, idx: int) -> bytes:
    """Extract ONE frame as a standalone FAKEIMG payload — no full-video
    materialization (the random-access contract a real container format
    provides via its index)."""
    magic, w, h, c, n = _VHEADER.unpack_from(payload)
    if magic != _VMAGIC:
        raise ValueError("not a FAKEVID payload")
    if not 0 <= idx < n:
        raise IndexError(idx)
    fsz = w * h * c
    off = _VHEADER.size + idx * fsz
    return _HEADER.pack(_MAGIC, w, h, c) + payload[off : off + fsz]


class AudioFeatures:
    """Actor-pool decode + feature stage: duration, RMS, zero-crossing rate.

    Probes for a real codec in ``__init__`` like ImageFeatures (soundfile is
    absent in this container -> NotImplementedError with use_real_codec)."""

    def __init__(self, use_real_codec: bool = False):
        if use_real_codec:
            try:
                import soundfile  # noqa: F401  (absent in this container)
            except ImportError as e:
                raise NotImplementedError(
                    "real audio decode requires soundfile, which is not "
                    "installed; use the deterministic fake codec"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, rmss, zcrs = [], [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            sr, x = decode_fake_audio(payload)
            f = x.astype(np.float64)
            ids.append(media_id)
            durs.append(len(x) / sr)
            rmss.append(float(np.sqrt(np.mean(f * f))))
            zcrs.append(float(np.mean(np.signbit(f[1:]) != np.signbit(f[:-1]))))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "duration_s": pa.array(np.round(durs, 6), type=pa.float64()),
                "rms": pa.array(np.round(rmss, 6), type=pa.float64()),
                "zcr": pa.array(np.round(zcrs, 6), type=pa.float64()),
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage: one video row in -> ``k`` image rows
    out (the flat-map shape of real frame extraction), each frame a
    standalone FAKEIMG payload chainable into ImageFeatures/Thumbnailer."""

    def __init__(self, every: int = 4):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n = _VHEADER.unpack_from(payload)[4]
            for i in range(0, n, self.every):
                ids.append(media_id)
                idxs.append(i)
                frames.append(decode_fake_video_frame(payload, i))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "payload": pa.array(frames, type=pa.binary()),
            }
        )


def synthesize_av_media(out_path: str, n: int = 64, seed: int = 77) -> str:
    """Write an av_media.parquet of fake audio + video payloads."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            ns = int(rng.integers(8_000, 48_000))
            rows.append(("audio", encode_fake_audio(seed * 7 + i, ns)))
        else:
            w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            nf = int(rng.integers(4, 24))
            rows.append(("video", encode_fake_video(seed * 11 + i, w, h, nf)))
    tbl = pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array([k for k, _ in rows], type=pa.string()),
            "payload": pa.array([p for _, p in rows], type=pa.binary()),
        }
    )
    pq.write_table(tbl, out_path)
    return out_path


def video_frame_features(
    media_parquet: str, every: int = 4, concurrency: int = 2
) -> pd.DataFrame:
    """read -> frame-sample (flat-map actor stage) -> per-frame image
    features; binary rows keep small batches end to end."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(media_parquet, columns=["media_id", "kind", "payload"])
    vids = ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], pa.scalar("video"))),
        batch_format="pyarrow",
    )
    frames = vids.map_batches(
        FrameSampler, fn_constructor_args=(every,), batch_format="pyarrow",
        max_restarts=0,
        batch_size=16, concurrency=concurrency,
    )
    # per-frame features run as a TASK pool, not a second actor pool: two
    # chained actor pools reserve 2 x concurrency CPUs up front and starve
    # the read tasks on small CPU budgets (deadlock observed at 4 CPUs);
    # the fake codec is stateless so tasks lose nothing
    out = frames.map_batches(
        _frame_features_batch, batch_format="pyarrow", batch_size=64
    )
    df = out.to_pandas()
    if df.empty:
        return df
    return df.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def _frame_features_batch(batch: pa.Table) -> pa.Table:
    out = ImageFeatures()(batch)
    return out.append_column("frame_idx", batch["frame_idx"])


def audio_feature_pipeline(media_parquet: str, concurrency: int = 2) -> pd.DataFrame:
    import pyarrow.compute as pc

    ds = rd.read_parquet(media_parquet, columns=["media_id", "kind", "payload"])
    auds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], pa.scalar("audio"))),
        batch_format="pyarrow",
    )
    out = auds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=64, concurrency=concurrency
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def multimodal_media_features(sf_dir: str) -> pd.DataFrame:
    """queries() entry (rows-only): the full multimodal plumbing end to end —
    image features, audio features, video frame-sampling chained into image
    features — over deterministic fake media cached under /tmp, with
    in-process spot-decode asserts on every call."""
    import os

    root = "/tmp/canal_ray_media"
    os.makedirs(root, exist_ok=True)
    img_path = os.path.join(root, "media.parquet")
    av_path = os.path.join(root, "av_media.parquet")
    if not os.path.exists(img_path):
        synthesize_media(img_path, n=256, seed=99)
    if not os.path.exists(av_path):
        synthesize_av_media(av_path, n=64, seed=77)

    img = image_feature_pipeline(img_path)
    aud = audio_feature_pipeline(av_path)
    vid = video_frame_features(av_path)

    # spot oracles: re-decode three payloads in-process and compare
    import pyarrow.parquet as pq

    t = pq.read_table(img_path, columns=["media_id", "payload"])
    for i in (0, 128, 255):
        w, h, c, px = decode_fake_image(t["payload"][i].as_py())
        row = img[img["media_id"] == t["media_id"][i].as_py()].iloc[0]
        if int(row["width"]) != w or abs(
            row["mean_luma"] - round(float(px.astype(np.float64).mean()), 6)
        ) > 1e-9:
            raise AssertionError("image feature stage diverged from direct decode")
    ta = pq.read_table(av_path, columns=["media_id", "kind", "payload"])
    kinds = ta["kind"].to_pylist()
    a_i = kinds.index("audio")
    sr, x = decode_fake_audio(ta["payload"][a_i].as_py())
    arow = aud[aud["media_id"] == ta["media_id"][a_i].as_py()].iloc[0]
    if abs(arow["duration_s"] - round(len(x) / sr, 6)) > 1e-9:
        raise AssertionError("audio feature stage diverged from direct decode")

    img = img.assign(kind="image", frame_idx=-1, duration_s=np.nan)
    aud = aud.assign(kind="audio", frame_idx=-1, width=-1, mean_luma=np.nan)
    vid = vid.assign(kind="video_frame", duration_s=np.nan)
    cols = ["media_id", "kind", "frame_idx", "width", "mean_luma", "duration_s"]
    out = pd.concat(
        [d.reindex(columns=cols) for d in (img, aud, vid)], ignore_index=True
    )
    return out.sort_values(["kind", "media_id", "frame_idx"]).reset_index(drop=True)


def image_feature_pipeline(media_parquet: str, concurrency: int = 2) -> pd.DataFrame:
    """read -> decode/feature actor pool; small batches for wide binary rows."""
    ds = rd.read_parquet(media_parquet, columns=["media_id", "payload"])
    out = ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=64,  # binary payloads: keep batch x concurrency bounded
        concurrency=concurrency,
    )
    return out.to_pandas()


def thumbnail_pipeline(media_parquet: str, out_dir: str, concurrency: int = 2) -> str:
    ds = rd.read_parquet(media_parquet, columns=["media_id", "payload"])
    out = ds.map_batches(
        Thumbnailer, batch_format="pyarrow", batch_size=64, concurrency=concurrency
    )
    out.write_parquet(out_dir)
    return out_dir
