"""Multimodal (image/audio/video) column plumbing — real Ray, real + stubbed codecs.

Media are opaque ``binary`` columns with typed metadata, processed by
actor-pool ``map_batches`` stages with small batch sizes (wide binary rows:
batch_size x concurrency must fit worker heaps — the block-size discipline of
SURVEY.md §7.5 "wide rows").

Codec layer, three tiers:

1. REAL stdlib-only decoders — WAV (PCM via the stdlib ``wave`` module),
   PPM (P6 binary, header + raster parse) and BMP (24bpp BI_RGB, header +
   padded bottom-up BGR raster). These are genuine end-to-end media paths:
   bytes produced by any standard tool decode here with no dependencies.
2. A clearly-marked deterministic FAKE codec (tiny header + seeded
   pseudo-pixels) that exercises the same plumbing for formats we can't
   decode, keeping fixtures cheap.
3. Formats that require a real library (JPEG/PNG/MP4/FLAC...) raise
   ``NotImplementedError`` unless PIL/soundfile are importable — honestly
   gated, never silently faked.

``decode_image`` / ``decode_audio`` sniff the payload magic and dispatch
across the tiers, so one actor pool processes mixed-format columns.
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


# --------------------------------------------------------------------------
# REAL stdlib-only codecs: PPM (P6), BMP (24bpp BI_RGB), WAV (PCM 16-bit).
# These parse/produce the actual public file formats byte-for-byte — no
# third-party library involved — so the pipelines below are genuine
# end-to-end media paths for these formats.


def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = px.shape
    if c != 3:
        raise ValueError("PPM P6 is 3-channel RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(px, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Binary PPM (P6) -> (w, h, 3, pixels). Handles whitespace and
    ``#`` comment lines in the header per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates maxval from the raster
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError("only maxval-255 PPM supported")
    px = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=w * h * 3)
    return w, h, 3, px.reshape(h, w, 3)


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp BI_RGB BMP (bottom-up, BGR, rows padded
    to 4 bytes — the classic Windows DIB layout)."""
    h, w, c = px.shape
    if c != 3:
        raise ValueError("24bpp BMP is 3-channel")
    row = w * 3
    pad = (-row) % 4
    bgr = np.ascontiguousarray(px[::-1, :, ::-1], dtype=np.uint8).reshape(h, row)
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = bgr
        raster = padded.tobytes()
    else:
        raster = bgr.tobytes()
    data_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + raster


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """24bpp BI_RGB BMP -> (w, h, 3, RGB pixels). Supports bottom-up (the
    default) and top-down (negative height) rasters."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    _, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24bpp uncompressed (BI_RGB) BMP supported")
    h, topdown = abs(h_signed), h_signed < 0
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, dtype=np.uint8, offset=data_off, count=stride * h)
    px = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    if not topdown:
        px = px[::-1]
    return w, h, 3, np.ascontiguousarray(px)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 samples -> RIFF/WAVE PCM bytes (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (sample_rate, mono int16 samples). Multi-channel
    input is downmixed by mean (stdlib ``wave``; 16-bit PCM only)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        sr = w.getframerate()
        x = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        ch = w.getnchannels()
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return sr, x


def decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Magic-sniffing image decode: FAKEIMG | PPM (P6) | BMP (24bpp BI_RGB)
    natively; anything else (JPEG/PNG/...) is honestly gated on PIL."""
    if payload[: len(_MAGIC)] == _MAGIC:
        return decode_fake_image(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "unrecognized image format (JPEG/PNG need PIL, which is not installed); "
        "native formats: FAKEIMG, PPM(P6), BMP(24bpp)"
    )


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Magic-sniffing audio decode: FAKEAUD | WAV (RIFF PCM) natively;
    anything else (MP3/FLAC/...) is honestly gated on soundfile."""
    if payload[: len(_AMAGIC)] == _AMAGIC:
        return decode_fake_audio(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "unrecognized audio format (MP3/FLAC need soundfile, which is not "
        "installed); native formats: FAKEAUD, WAV(16-bit PCM)"
    )


def synthesize_media(out_path: str, n: int = 256, seed: int = 99) -> str:
    """Write a media.parquet of image payloads with typed metadata — a MIX of
    real formats (PPM, BMP — decoded by the stdlib-only codecs above) and the
    FAKEIMG container, exactly as a production media column mixes sources."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        if i % 3 == 1:
            px = np.random.default_rng(seed * 1_000_003 + i).integers(
                0, 256, size=(h, w, 3), dtype=np.uint8
            )
            payload = encode_ppm(px)
        elif i % 3 == 2:
            px = np.random.default_rng(seed * 1_000_003 + i).integers(
                0, 256, size=(h, w, 3), dtype=np.uint8
            )
            payload = encode_bmp(px)
        else:
            payload = encode_fake_image(seed * 1_000_003 + i, w, h)
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "width": w,
                "height": h,
                "payload": payload,
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
            w, h, c, px = decode_image(payload)
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
    """Actor-pool resize stage (stride subsampling as the 'resize' kernel).

    3-channel thumbnails are emitted as REAL binary PPM (any standard tool
    can open the output column); other channel counts fall back to the
    FAKEIMG container."""

    def __init__(self, out_size: int = 8):
        self.out = out_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs = [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, px = decode_image(payload)
            ys = np.linspace(0, h - 1, self.out).astype(int)
            xs = np.linspace(0, w - 1, self.out).astype(int)
            thumb = px[np.ix_(ys, xs)]
            ids.append(media_id)
            if c == 3:
                thumbs.append(encode_ppm(thumb))
            else:
                thumbs.append(
                    _HEADER.pack(_MAGIC, self.out, self.out, c) + thumb.tobytes()
                )
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
            sr, x = decode_audio(payload)
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
            if i % 4 == 2:
                # REAL RIFF/WAVE bytes (stdlib wave), same seeded samples
                smp = np.random.default_rng(seed * 7 + i).integers(
                    -(1 << 14), 1 << 14, size=ns, dtype=np.int16
                )
                rows.append(("audio", encode_wav(smp, 16_000)))
            else:
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
    # _v2: the r5 synthesizers mix REAL formats (PPM/BMP/WAV) into the
    # columns — a fixture format change must not be served by a stale cache
    img_path = os.path.join(root, "media_v2.parquet")
    av_path = os.path.join(root, "av_media_v2.parquet")
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
    # indices 0/1/2 mod 3 cover all three on-disk formats (FAKEIMG/PPM/BMP)
    for i in (0, 127, 254):
        w, h, c, px = decode_image(t["payload"][i].as_py())
        row = img[img["media_id"] == t["media_id"][i].as_py()].iloc[0]
        if int(row["width"]) != w or abs(
            row["mean_luma"] - round(float(px.astype(np.float64).mean()), 6)
        ) > 1e-9:
            raise AssertionError("image feature stage diverged from direct decode")
    ta = pq.read_table(av_path, columns=["media_id", "kind", "payload"])
    kinds = ta["kind"].to_pylist()
    # spot-check one FAKEAUD row and one real-WAV row
    for a_i in (kinds.index("audio"), kinds.index("audio") + 2):
        sr, x = decode_audio(ta["payload"][a_i].as_py())
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
