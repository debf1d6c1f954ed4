"""Vectorized exact MD5 for batches of short messages.

The dedup/sketch/fingerprint kernels hash one short string per shingle/token
with the md5 CONTRACT (DuckDB ships md5(), so every mirror reproduces the
exact hash).  `hashlib.md5` costs ~1 us of interpreter overhead per call —
at 100 TB, per-gram Python md5 is the dominant CPU (VERDICT r2 #5).  This
module computes the identical digests vectorized in numpy: messages <= 55
bytes are single-block MD5, so padding is a (N, 64) uint8 scatter and the 64
rounds run as uint32 vector ops over all N messages at once (~10-30x the
throughput of the hashlib loop; property-tested bit-equal in
tests/test_extras.py::TestFastMd5).  Longer messages (rare: shingles and
tokens are words) fall back to hashlib rows.

Reference: RFC 1321 (public); layout notes: the digest is A||B||C||D with
each register serialized little-endian, so
``int(hexdigest()[:8], 16)  == byteswap(A)`` and
``int(hexdigest()[:16], 16) == byteswap(A) << 32 | byteswap(B)``.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

_K = np.array([int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF
               for i in range(64)], dtype=np.uint32)
_S = ([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 +
      [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4)
_G = ([i for i in range(16)] + [(5 * i + 1) % 16 for i in range(16, 32)] +
      [(3 * i + 5) % 16 for i in range(32, 48)] + [(7 * i) % 16 for i in range(48, 64)])
_INIT = (np.uint32(0x67452301), np.uint32(0xEFCDAB89),
         np.uint32(0x98BADCFE), np.uint32(0x10325476))
_MAX1 = 55  # single-block limit: len + 0x80 + 8-byte length <= 64
# Per-length single-block MD5 padding: 0x80, zeros, 8-byte LE bit length.
_PAD_TABLE = tuple(
    b"\x80" + b"\x00" * (_MAX1 - L) + (L * 8).to_bytes(8, "little")
    for L in range(_MAX1 + 1))


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def _md5_rounds(M: np.ndarray) -> np.ndarray:
    """(N, 16) uint32 message blocks -> (N, 4) uint32 registers (A,B,C,D).

    Allocation-free inner loop: two scratch vectors plus register-buffer
    recycling (the old A buffer becomes the next round's scratch), and the
    message transposed so each round's block column is a contiguous view."""
    n = M.shape[0]
    MT = np.ascontiguousarray(M.T)
    a = np.full(n, _INIT[0], dtype=np.uint32)
    b = np.full(n, _INIT[1], dtype=np.uint32)
    c = np.full(n, _INIT[2], dtype=np.uint32)
    d = np.full(n, _INIT[3], dtype=np.uint32)
    f = np.empty(n, dtype=np.uint32)
    t = np.empty(n, dtype=np.uint32)
    for i in range(64):
        if i < 16:
            np.bitwise_and(b, c, out=f)
            np.bitwise_not(b, out=t)
            t &= d
            f |= t
        elif i < 32:
            np.bitwise_and(d, b, out=f)
            np.bitwise_not(d, out=t)
            t &= c
            f |= t
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            f ^= d
        else:
            np.bitwise_not(d, out=f)
            f |= b
            f ^= c
        f += a
        f += _K[i]
        f += MT[_G[i]]
        s = _S[i]
        np.left_shift(f, np.uint32(s), out=t)
        f >>= np.uint32(32 - s)
        t |= f
        t += b
        a, d, c, b, t = d, c, b, t, a
    out = np.empty((n, 4), dtype=np.uint32)
    np.add(a, _INIT[0], out=out[:, 0])
    np.add(b, _INIT[1], out=out[:, 1])
    np.add(c, _INIT[2], out=out[:, 2])
    np.add(d, _INIT[3], out=out[:, 3])
    return out


def md5_words(msgs: list[bytes]) -> np.ndarray:
    """Exact MD5 of each message: (N, 4) uint32 registers (A, B, C, D).

    Vectorized single-block path for len <= 55; hashlib for longer rows."""
    n = len(msgs)
    out = np.empty((n, 4), dtype=np.uint32)
    if n < 256:
        # Below ~256 messages the numpy fixed overhead loses to OpenSSL;
        # identical digests either way.
        for i, m in enumerate(msgs):
            out[i] = np.frombuffer(hashlib.md5(m).digest(), dtype="<u4")
        return out
    pad = _PAD_TABLE
    if n and max(map(len, msgs)) <= _MAX1:   # C-level pre-scan, common case
        small_rows = [m + pad[len(m)] for m in msgs]
        big_rows: list[int] = []
    else:
        small_rows = []
        big_rows = []
        for i, m in enumerate(msgs):
            if len(m) <= _MAX1:
                small_rows.append(m + pad[len(m)])
            else:
                big_rows.append(i)
    all_small = not big_rows
    if small_rows:
        # Padding happens at join time via the precomputed 56-entry pad
        # table (0x80 + zeros + little-endian bit length), so the (m, 64)
        # block buffer is ONE contiguous C-level copy — a numpy fancy
        # scatter here measured ~10x slower than the whole round loop.
        joined = b"".join(small_rows)
        m = len(small_rows)
        M = np.frombuffer(joined, dtype="<u4").reshape(m, 16)
        # Chunk so the 8 live register/scratch vectors (~8 x 4B x chunk) fit
        # in L2 across all 64 rounds — the loop is bandwidth-bound otherwise
        # (measured ~2.4x on this box).
        chunk = 16384
        if all_small:
            with np.errstate(over="ignore"):
                for lo in range(0, m, chunk):
                    out[lo:lo + chunk] = _md5_rounds(M[lo:lo + chunk])
        else:
            big_set = set(big_rows)
            idx = np.fromiter((i for i in range(n) if i not in big_set),
                              dtype=np.int64, count=m)
            with np.errstate(over="ignore"):
                for lo in range(0, m, chunk):
                    out[idx[lo:lo + chunk]] = _md5_rounds(M[lo:lo + chunk])
    for i in big_rows:
        out[i] = np.frombuffer(hashlib.md5(msgs[i]).digest(), dtype="<u4")
    return out


def _bswap32(x: np.ndarray) -> np.ndarray:
    return x.byteswap()


def md5_first32(msgs: list[bytes]) -> np.ndarray:
    """int(md5(m).hexdigest()[:8], 16) per message, as uint32."""
    return _bswap32(md5_words(msgs)[:, 0])


def md5_first64(msgs: list[bytes]) -> np.ndarray:
    """int(md5(m).hexdigest()[:16], 16) per message, as uint64."""
    w = md5_words(msgs)
    return (_bswap32(w[:, 0]).astype(np.uint64) << np.uint64(32)) | \
        _bswap32(w[:, 1]).astype(np.uint64)


def md5_int60(msgs: list[bytes]) -> np.ndarray:
    """int(md5(m).hexdigest()[:15], 16) per message, as int64 (60-bit)."""
    return (md5_first64(msgs) >> np.uint64(4)).astype(np.int64)
