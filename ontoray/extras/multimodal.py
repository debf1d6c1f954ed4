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

import hashlib

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
        # md5-32 of the payload bytes (not crc32: DuckDB ships md5(), so the
        # fake decode has an exact SQL oracle — sql_image_features below).
        h = int(hashlib.md5(raw).hexdigest()[:8], 16)
        width = 64 + (h & 0x3FF)
        height = 64 + ((h >> 10) & 0x3FF)
        mean_luma = ((h >> 20) & 0xFF) / 255.0
        phash = (h * 2654435761) & 0x7FFFFFFFFFFFFFFF
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


def sql_image_features(table: str = "documents") -> str:
    """DuckDB mirror of the ``multimodal_image_features`` query: payload =
    utf-8 bytes of ``text`` (md5(VARCHAR) hashes those same bytes), url =
    'doc-' || doc_id, then the identical md5-32 bit-twiddles as ``_decode``.
    All products fit UBIGINT exactly: h < 2^32, h * 2654435761 < 2^64."""
    return f"""
    WITH h AS (
      SELECT 'doc-' || doc_id AS url,
             ('0x' || substr(md5(coalesce(text, '')), 1, 8))::UBIGINT AS hv,
             octet_length(encode(coalesce(text, ''))) AS n_bytes
      FROM {table}
    )
    SELECT url,
           (64 + (hv & 1023))::INTEGER AS width,
           (64 + ((hv >> 10) & 1023))::INTEGER AS height,
           n_bytes::BIGINT AS n_bytes,
           ((((hv >> 20) & 255)::DOUBLE) / 255.0)::FLOAT AS mean_luma,
           ((hv * 2654435761) & 9223372036854775807)::BIGINT AS phash
    FROM h
    """


def decode_images(ds, fake: bool = False, payload_col: str = "payload",
                  key_col: str = "url", concurrency: int = 2, batch_size: int = 64):
    """Actor-pool decode with small batches (payload-heavy binary rows)."""
    return ds.map_batches(
        DecodeImage, fn_constructor_args=(fake, payload_col, key_col),
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency))
