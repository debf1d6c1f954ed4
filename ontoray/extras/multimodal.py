"""Multimodal binary-column stages (decode / feature-extract plumbing).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata.
The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``DecodeImage(fake=False)`` raises NotImplementedError at the
decode call, while ``fake=True`` substitutes a deterministic
hash-of-bytes pseudo-decode so the Ray-side plumbing — schema, actor-pool
signature, small-batch sizing, output layout — is real and tested.

These stages are the pattern for any heavy per-record model stage: state in
``__init__``, small ``batch_size`` (large payload rows), actor pool sized via
``concurrency``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

IMAGE_FEATURE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_bytes", pa.int64()),
    ("mean_luma", pa.float32()),
    ("phash", pa.int64()),
])


class DecodeImage:
    """binary image column -> decoded feature rows (actor-pool stage).

    Real deployments replace ``_decode`` with a PIL/opencv call loaded once
    per actor; batch_size should be small (payload-heavy rows).
    """

    def __init__(self, fake: bool = False, payload_col: str = "payload",
                 key_col: str = "url"):
        self.fake = fake
        self.payload_col = payload_col
        self.key_col = key_col

    def _decode(self, raw: bytes) -> tuple[int, int, float, int]:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an imaging library not present in this "
                "environment; run with fake=True for the deterministic stub")
        h = zlib.crc32(raw)
        width = 64 + (h & 0x3FF)
        height = 64 + ((h >> 10) & 0x3FF)
        mean_luma = ((h >> 20) & 0xFF) / 255.0
        phash = int(np.int64((h * 2654435761) & 0x7FFFFFFFFFFFFFFF))
        return width, height, mean_luma, phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        w, hgt, luma, ph, nb = [], [], [], [], []
        for raw in payloads:
            raw = raw or b""
            a, b, c, d = self._decode(raw)
            w.append(a)
            hgt.append(b)
            luma.append(c)
            ph.append(d)
            nb.append(len(raw))
        return pa.table({
            "url": pa.array(keys, pa.string()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(hgt, pa.int32()),
            "n_bytes": pa.array(nb, pa.int64()),
            "mean_luma": pa.array(luma, pa.float32()),
            "phash": pa.array(ph, pa.int64()),
        }).cast(IMAGE_FEATURE_SCHEMA)


def decode_images(ds, fake: bool = False, payload_col: str = "payload",
                  key_col: str = "url", concurrency: int = 2, batch_size: int = 64):
    """Actor-pool decode with small batches (payload-heavy binary rows)."""
    return ds.map_batches(
        DecodeImage, fn_constructor_args=(fake, payload_col, key_col),
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency))
