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
